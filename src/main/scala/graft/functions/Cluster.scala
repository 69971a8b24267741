package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-quality diagnostics over an embedding column — the audit
  * that tells a pipeline whether its labels / cluster assignments
  * actually separate in embedding space (before trusting them for
  * semantic dedup buckets, stratified sampling, or classifier
  * prototypes).
  *
  * Reference scope note: the reference (feast) has no vector surface —
  * this is part of the training-data-pipeline extension, alongside
  * [[Similarity]] and [[VectorSketch]].
  */
object Cluster {

  /** Simplified (centroid-based) silhouette score per label —
    * Rousseeuw 1987's silhouette with the O(n²) pairwise distances
    * replaced by distances to class centroids (the standard large-scale
    * variant, e.g. Hruschka 2004): for each vector, a = distance to its
    * own label's centroid, b = the nearest OTHER centroid, s =
    * (b−a)/max(a,b) ∈ [−1, 1]; the per-label mean diagnoses which
    * classes are coherent (≈1), overlapping (≈0), or mis-assigned (<0).
    *
    * 100 TB shape: centroids are one posexplode + (label, dim) hash
    * aggregation (map-side combinable, output = labels × dims), then
    * collected — the label space is class-grain, bounded, exactly like
    * the PQ/IVF anchor matrices — and every distance is a narrow
    * codegen'd projection against centroid LITERALS via the native
    * [[DotProductExpr]]: d²(x,c) = x·x − 2·x·c + c·c, so the corpus is
    * scanned once with no joins and no shuffle beyond the final
    * label-grain aggregation.
    *
    * Determinism contract (cross-engine): centroids divide ROUNDED
    * sums (the [[graft.queries.VectorQueries.labelCentroids]]
    * contract); every dot product is the ascending-index
    * left-associative double fold shared by [[DotProduct]] and DuckDB's
    * `list_dot_product`; per-row silhouettes are scaled to integer
    * micros (round-half-away-from-zero, both engines) so the per-label
    * sum is exact BIGINT arithmetic — identical under ANY aggregation
    * order — and only the final mean divides doubles.
    *
    * @return one row per label: (label, n, mean_silhouette) with
    *         mean_silhouette rounded to 6 decimals.
    */
  def simplifiedSilhouette(df0: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    // labels must be integral at PLAN time: the long cast turns string
    // labels into NULLs that only NPE driver-side at getLong, with no
    // hint at the cause, and silently MERGES fractional numerics
    // (1.0 and 1.7 both become 1) — review r6
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val t = df0.schema(labelCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"simplifiedSilhouette needs integral labels; '$labelCol' is $t — " +
          "map labels to longs (e.g. a dictionary or xxhash64) first")
    }
    // null labels have no centroid; null / ragged vectors have no
    // defined distance — a null d2 row previously scored EXACTLY +1.0
    // (own coalesced to null -> a = 0 while least() skipped the nulls
    // -> b = sqrt(MaxValue)) and inflated the per-label mean; exclude
    // them from the scoring pass like the centroid pass already does
    val df = df0.filter(col(labelCol).isNotNull && col(vecCol).isNotNull)
    // class-grain centroid matrix, collected like the PQ anchor matrix
    val centroids: Array[(Long, Array[Double])] = df
      .select(col(labelCol).cast("long").as("__l"),
        posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .groupBy("__l", "__p")
      // count the non-null ELEMENTS, not the rows: sum() skips a null
      // element but count(lit(1)) counted it, biasing that dimension's
      // centroid toward zero — while the same vector is excluded from
      // scoring as undefined (review r11)
      .agg(count(col("__v")).as("__n"), round(sum(col("__v").cast("double")), 6).as("__s"))
      .select(col("__l"), col("__p"), round(col("__s") / col("__n"), 6).as("__c"))
      .collect()
      .groupBy(_.getLong(0))
      .toArray
      .map { case (l, rows) =>
        val c = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        (l, c)
      }
      .sortBy(_._1)
    require(centroids.length >= 2,
      s"simplifiedSilhouette needs >= 2 labels, got ${centroids.length}")

    // c·c as a driver-side ascending fold — the same IEEE op sequence
    // as list_dot_product(c, c) on the oracle side
    def selfDot(c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }
    val v = col(vecCol)
    val xx = DotProductExpr.dot(v, v)
    def centLit(c: Array[Double]): Column = array(c.toIndexedSeq.map(lit(_)): _*)
    // one d² column per label, each dot computed once in the projection
    val d2Cols = centroids.map { case (l, c) =>
      (xx - lit(2.0) * DotProductExpr.dot(v, centLit(c)) + lit(selfDot(c))).as(s"__d2_$l")
    }
    val withD2 = df.select(col(labelCol).cast("long").as("__l") +: d2Cols.toIndexedSeq: _*)

    val own = coalesce(centroids.toIndexedSeq.map { case (l, _) =>
      when(col("__l") === l, col(s"__d2_$l"))
    }: _*)
    val otherMin = least(centroids.toIndexedSeq.map { case (l, _) =>
      when(col("__l") === l, lit(Double.MaxValue)).otherwise(col(s"__d2_$l"))
    }: _*)

    val a = sqrt(greatest(col("__own"), lit(0.0)))
    val b = sqrt(greatest(col("__omin"), lit(0.0)))
    val sil = when(greatest(a, b) > 0, (b - a) / greatest(a, b)).otherwise(lit(0.0))

    withD2
      .select(col("__l"), own.as("__own"), otherMin.as("__omin"))
      // a RAGGED vector (length != the centroid's) nulls its dot
      // products: own would be null while least() skipped the nulls —
      // the +1.0 inflation again, from a different door; such rows
      // have no defined silhouette and are excluded
      .filter(col("__own").isNotNull && col("__omin").isNotNull)
      .select(col("__l"),
        round(sil * lit(1e6), 0).cast("long").as("__m"))
      .groupBy(col("__l").as("label"))
      .agg(count(lit(1)).as("n"), sum("__m").as("__sm"))
      .select(col("label"), col("n"),
        round(col("__sm").cast("double") / col("n") / lit(1e6), 6)
          .as("mean_silhouette"))
      .orderBy("label")
  }
}
