package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Residual-vs-raw IVF-PQ quality probe (dev tool, backs the r16
  * residual rows in BENCH_NOTES — VERDICT r15 #4's measurement half):
  * at EQUAL code size (same m, subDim, c, same trained coarse cells,
  * same nProbe) it compares
  *   (a) mean squared reconstruction distortion — raw encode
  *       reconstructs x ≈ codebook(code(x)); residual encode
  *       reconstructs x ≈ centroid(cell) + residCodebook(code(x −
  *       centroid)), so its quantizer only has to describe the
  *       within-cell displacement (FAISS IVFPQ's accuracy source) —
  *   (b) recall@k against exact L2 ground truth through the ACTUAL
  *       persisted-index search paths (ivfPqSearchIndex vs
  *       ivfPqResidualSearchIndex).
  * Note the testdata embeddings are near-isotropic random vectors, the
  * adversarial case for residual coding (centroids capture little
  * variance, so residuals are nearly the raw vectors re-centered);
  * expect a modest margin here and a larger one on clustered real
  * corpora.
  *
  *   runMain graft.tools.ResidualProbe [sfDir] [k] [nProbe]
  */
object ResidualProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
    val (m, subDim, c, nCells) = (8, 8, 8, 16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val train = e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
    val cells: Seq[(Long, Array[Float])] =
      Similarity.kmeansCentroids(train, "vec_id", "embedding", nCells, iters = 2)
        .map { case (id, v) => id -> v.map(_.toFloat).toArray }
    val rawCb = Similarity.trainPqCodebooks(
      train, "vec_id", "embedding", m, subDim, c, iters = 2)
    val resCb = Similarity.trainResidualPqCodebooks(
      train, "vec_id", "embedding", cells, m, subDim, c, iters = 2)

    val all = e.orderBy("vec_id").collect()
      .map(row => row.getLong(0) -> row.getSeq[Float](1).toArray)
    val vecs = all.map(_._2)
    // per-vector residual against the DRIVER-side nearest cell (cosine
    // argmax, ties to the smaller cell id — the probe-path rule)
    def cellOf(v: Array[Float]): Int = {
      def dcos(a: Array[Float], b: Array[Float]): Double = {
        var sab = 0.0; var saa = 0.0; var sbb = 0.0; var i = 0
        while (i < a.length) {
          sab += a(i).toDouble * b(i).toDouble
          saa += a(i).toDouble * a(i).toDouble
          sbb += b(i).toDouble * b(i).toDouble
          i += 1
        }
        sab / (math.sqrt(saa) * math.sqrt(sbb))
      }
      cells.indices.map(i => (-dcos(v, cells(i)._2), i)).min._2
    }
    val residuals = vecs.map { v =>
      val cv = cells(cellOf(v))._2
      Array.tabulate(v.length)(d => (v(d).toDouble - cv(d).toDouble).toFloat)
    }
    val dRaw = Similarity.pqReconstructionMse(vecs, rawCb, m, subDim)
    // centroid cancels in the error term: ‖(c + q(r)) − x‖² = ‖q(r) − r‖²
    val dRes = Similarity.pqReconstructionMse(residuals, resCb, m, subDim)

    // exact L2 ground truth for the first 32 ids
    def exactTopK(qid: Long, q: Array[Float]): Set[Long] =
      all.filter(_._1 != qid).map { case (id, v) =>
        var d = 0.0; var i = 0
        while (i < v.length) {
          val x = q(i).toDouble - v(i).toDouble; d += x * x; i += 1
        }
        (d, id)
      }.sortBy(identity).take(k).map(_._2).toSet
    val truth = all.take(32).map { case (id, v) => id -> exactTopK(id, v) }.toMap
    val q = e.filter(col("vec_id").isin(truth.keys.toSeq: _*))

    def recallOf(idx: org.apache.spark.sql.DataFrame, residual: Boolean): Double = {
      val got = (if (residual)
        Similarity.ivfPqResidualSearchIndex(idx, q, "vec_id", "embedding",
          cells, resCb, k, nProbe, m, subDim)
      else
        Similarity.ivfPqSearchIndex(idx, q, "vec_id", "embedding",
          cells, rawCb, k, nProbe, m, subDim))
        .collect().map(row => row.getLong(0) -> row.getLong(1))
        .groupBy(_._1).map { case (qid, ns) => qid -> ns.map(_._2).toSet }
      val rs = truth.map { case (qid, t) =>
        (t & got.getOrElse(qid, Set.empty)).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val rawIdx = Similarity.ivfPqBuildIndex(e, "vec_id", "embedding", cells, rawCb, m, subDim)
    val resIdx = Similarity.ivfPqResidualBuildIndex(e, "vec_id", "embedding", cells, resCb, m, subDim)
    val rRaw = recallOf(rawIdx, residual = false)
    val rRes = recallOf(resIdx, residual = true)

    println(f"| corpus | nProbe/$nCells | dist raw | dist residual | margin | recall@$k raw | recall@$k residual |")
    println(f"| ${all.length} | $nProbe | $dRaw%.4f | $dRes%.4f | ${(1 - dRes / dRaw) * 100}%.1f%% | $rRaw%.3f | $rRes%.3f |")
    println(
      f"""{"corpus":${all.length},"dist_raw":$dRaw%.5f,"dist_residual":$dRes%.5f,"margin_pct":${(1 - dRes / dRaw) * 100}%.2f,"recall_raw":$rRaw%.3f,"recall_residual":$rRes%.3f}""")
    spark.stop()
  }
}
