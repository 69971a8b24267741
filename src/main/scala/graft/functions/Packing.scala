package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data export packing: assign each document to an output
  * shard so that shards hold ≈ `budgetTokens` consecutive tokens in a
  * deterministic global order (the order of `idCol`). The classic
  * "pack the corpus into N-token shards" step in front of tokenizer /
  * sequence-building jobs:
  *
  *   shard_id(doc) = floor(prefix_tokens_before(doc) / budgetTokens)
  *
  * Distributed prefix sum — never a single global window over the
  * corpus:
  *
  *   1. slice the id space into `parts` ordered ranges. The slice id is
  *      a PURE FUNCTION of the id value: bounds are computed ONCE on
  *      the driver from a deterministic per-partition reservoir sample
  *      and embedded as a literal in a binary-search expression
  *      ([[SearchSorted]]). This is the load-bearing difference from
  *      `repartitionByRange` + `spark_partition_id()`: that pair is
  *      only self-consistent if Spark's ReuseExchange dedupes the two
  *      identical exchanges below the running-sum and per-slice-total
  *      subtrees — with reuse off (or canonicalization drift), each
  *      subtree samples its own range bounds (RangePartitioner seeds on
  *      the per-execution RDD id) and the slice join silently assigns
  *      wrong offsets. A literal-bounds slice id is identical in every
  *      subtree under any config.
  *   2. running sums WITHIN each slice via a window keyed by the slice
  *      id — each window group is one slice, so group size is bounded
  *      by the sample balance (≈ rows/parts), not corpus size;
  *   3. cross-slice offsets from the per-slice totals: one row per
  *      slice, so the global ordering window there touches only
  *      #slices rows (thousands at 100 TB — bounded by design); they
  *      broadcast back to the data.
  *
  * The per-slice totals are a SEPARATE narrow aggregation of the input
  * (idCol + tokenCol only, map-side partial agg, no sort) rather than a
  * second consumer of the windowed subtree: correct regardless of
  * exchange reuse, and at 100 TB a column-pruned rescan + partial agg
  * is cheaper than re-running the full-width shuffle + sort the window
  * needs.
  *
  * The result is invariant to where the sampled slice boundaries land:
  * prefix_before(doc) depends only on the global id order. Requires
  * `idCol` values be unique (ties would make the within-slice running
  * sum order-ambiguous).
  */
object Packing {

  def packShards(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budgetTokens: Long,
      numPartitions: Option[Int] = None): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    // exact long `div`, not floor of a DOUBLE quotient: past 2^53 total
    // tokens the double mantissa silently misassigns shards — the same
    // hazard systematicWeightedSample guards loudly; prefix sums are
    // non-negative, so div == floor-div
    withPrefixOffset(df, idCol, tokenCol, numPartitions)
      .withColumn("shard_id", expr(s"__start div ${budgetTokens}L"))
      .drop("__start")
  }

  /** Context-window assignment: slice the doc_id-ordered token stream
    * into fixed `windowTokens` windows (the sequence-construction step
    * in front of training — documents CROSS window boundaries, unlike
    * [[packShards]]'s whole-doc shards) and report each doc's interval:
    * start offset, first/last window, and how many windows it spans.
    * Same distributed prefix sum; zero-token docs are dropped (they
    * occupy no interval). */
  def contextWindows(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      windowTokens: Long,
      numPartitions: Option[Int] = None): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val tok = col(tokenCol).cast("long")
    // exact long `div` over a bound end-offset column (same 2^53
    // rationale as packShards)
    withPrefixOffset(df, idCol, tokenCol, numPartitions)
      .filter(tok > 0)
      .withColumn("start_offset", col("__start"))
      .withColumn("__end", col("__start") + tok - 1)
      .withColumn("first_window", expr(s"__start div ${windowTokens}L"))
      .withColumn("last_window", expr(s"__end div ${windowTokens}L"))
      .withColumn("n_windows", col("last_window") - col("first_window") + 1)
      .drop("__start", "__end")
  }

  /** Dense 0-based index of each row in global `idCol` order — the
    * distributed zipWithIndex: the same sampled-bounds prefix sum with a
    * constant one token per row, so no global window and no
    * driver-side collect. Requires unique `idCol` values (like
    * [[packShards]]). */
  def withDenseIndex(
      df: DataFrame,
      idCol: String,
      outCol: String = "row_idx",
      numPartitions: Option[Int] = None): DataFrame = {
    // __one is exempt from withPrefixOffset's reserved-name guard (it
    // IS the token column here), so guard the overwrite explicitly — a
    // caller's __one would silently become the constant 1 and then drop
    require(!df.columns.contains("__one"),
      "input column '__one' collides with withDenseIndex's internal " +
        "constant-token column — rename it first")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different outCol " +
        "(a silent overwrite would destroy caller data; same guard as " +
        "withStartOffset)")
    withPrefixOffset(df.withColumn("__one", lit(1L)), idCol, "__one", numPartitions)
      .withColumn(outCol, col("__start"))
      .drop("__start", "__one")
  }

  /** Public face of the distributed prefix sum: `outCol` = tokens
    * before this row in global `idCol` order (exclusive prefix) —
    * for consumers outside the packing family (e.g. systematic
    * weighted sampling). Integer token counts stay exact at any
    * aggregation order; unique ids required, like [[packShards]]. */
  def withStartOffset(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      outCol: String = "start_offset",
      numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different outCol " +
        "(a silent rename would leave two identically named columns)")
    withPrefixOffset(df, idCol, tokenCol, numPartitions)
      .withColumnRenamed("__start", outCol)
  }

  /** The shared distributed prefix sum: appends `__start` = tokens
    * before this row in global `idCol` order (exclusive prefix). */
  private def withPrefixOffset(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      numPartitions: Option[Int]): DataFrame = {
    // internal working names are claimed with withColumn — a caller
    // column with one of these names would be silently overwritten and
    // then dropped; fail loudly instead
    // ONLY '__one' may double as the token column (withDenseIndex's
    // internal constant): exempting WHATEVER tokenCol is named let a
    // caller token column called '__cum'/'__pid'/'__start' pass the
    // guard and then resolve against the internal working column of the
    // same name — every offset silently corrupted (review r12)
    require(tokenCol == "__one" ||
      !Seq("__pid", "__cum", "__off", "__start", "__end", "__one").contains(tokenCol),
      s"token column '$tokenCol' collides with the prefix-sum's internal " +
        "working names — rename it first")
    val reserved = Seq("__pid", "__cum", "__off", "__start", "__end", "__one")
      .filterNot(_ == tokenCol) // withDenseIndex legitimately passes __one
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with the prefix-sum's " +
        "internal working names — rename them first")
    val parts = numPartitions.getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val tok = col(tokenCol).cast("long")

    val idType = df.schema(idCol).dataType
    val bounds = sliceBounds(df, idCol, parts)
    // a null id has no place in the global order: it would sort FIRST
    // in the offsets window (inflating every real slice's offset) and
    // then vanish through the null-unsafe __pid equi-join — silent data
    // loss plus corrupted offsets. Fail per-row, loudly.
    // null token counts are the same dirty-data hazard as null ids:
    // sum() skips them, so __start (and downstream shard_id) silently
    // came out null and the row fell out of every shard uncounted
    // (review r12). Fail per-row, loudly, like the id guard below.
    val guardedTok = when(tok.isNull,
      raise_error(lit(s"Packing: null '$tokenCol' — token counts must be " +
        "non-null (filter or fill dirty rows first)")).cast("long"))
      .otherwise(tok)
    val guardedId = when(col(idCol).isNull,
      raise_error(lit(s"Packing: null '$idCol' — the global order requires " +
        "non-null unique ids"))).otherwise(col(idCol))
    val sliced = df.withColumn("__pid",
      SearchSorted.column(guardedId, idType, bounds))

    // inclusive running sum within the slice
    val cum = sliced.withColumn("__cum",
      sum(guardedTok).over(Window.partitionBy("__pid").orderBy(idCol)))
    // per-slice totals -> exclusive prefix across slices; the
    // unpartitioned window runs over #slices rows only
    val totals = sliced.groupBy("__pid").agg(sum(guardedTok).as("__ptot"))
    val offsets = totals.withColumn("__off",
        coalesce(sum(col("__ptot")).over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))

    cum.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__start", col("__off") + col("__cum") - guardedTok)
      .drop("__pid", "__cum", "__off")
  }

  /** `parts - 1` approximate quantile bounds of `idCol`, from one
    * narrow job: a seeded reservoir sample per input partition (what
    * Spark's RangePartitioner.sketch does, but with partition-index
    * seeds so the bounds are reproducible), concatenated and reduced to
    * evenly spaced picks on the driver. Driver memory is bounded by
    * samplePerPart × #partitions values of one column. Balance is
    * approximate (per-partition samples are not weighted by partition
    * size) — that skews slice SIZES, never results: slice membership
    * only needs to be deterministic and id-ordered. */
  private def sliceBounds(df: DataFrame, idCol: String, parts: Int): Seq[Any] = {
    if (parts <= 1) return Nil
    val rdd = df.select(col(idCol)).rdd
    val sampleTarget = math.min(20L * parts, 1000000L)
    val samplePerPart =
      math.max(20, math.ceil(3.0 * sampleTarget / math.max(1, rdd.getNumPartitions)).toInt)
    val sampled = rdd.mapPartitionsWithIndex { (idx, it) =>
      val rng = new java.util.Random(0x9e3779b97f4a7c15L ^ idx)
      val res = new Array[Any](samplePerPart)
      var n = 0L
      it.foreach { row =>
        val v = row.get(0)
        if (v != null) {
          n += 1
          if (n <= samplePerPart) res((n - 1).toInt) = v
          else {
            val j = (rng.nextDouble() * n).toLong
            if (j < samplePerPart) res(j.toInt) = v
          }
        }
      }
      res.take(math.min(n, samplePerPart.toLong).toInt).iterator
    }.collect()
    if (sampled.isEmpty) return Nil
    // External sort order only decides WHICH sample values become
    // bounds (SearchSorted re-sorts them with the Catalyst ordering) —
    // wrong order skews slice balance, never results. All external
    // representations of atomic Spark types are Comparable.
    val sorted = sampled.head match {
      case _: Comparable[_] =>
        sampled.sortWith((a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)
      case _ => sampled.sortBy(_.toString)
    }
    val k = math.min(parts - 1, sorted.length)
    (1 to k).map(i => sorted((i.toLong * sorted.length / (k + 1)).toInt)).distinct
  }
}
