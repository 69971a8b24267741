package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** OPQ-vs-PQ quality probe (dev tool, backs the r15 OPQ rows in
  * BENCH_NOTES): trains plain PQ codebooks and the OPQ rotation on the
  * same bounded sample, then reports (a) mean squared reconstruction
  * distortion — OPQ is never worse by construction (the argmin
  * selection, spec-pinned) and this prints the measured margin — and
  * (b) ADC recall@k against exact L2 ground truth for both, so the
  * distortion gain's recall shadow is visible. Note the testdata
  * embeddings are near-isotropic random vectors — OPQ's gains come
  * from CORRELATED dimensions, so expect a modest margin here and a
  * larger one on real embedding corpora.
  *
  *   runMain graft.tools.OpqProbe [sfDir] [k]
  */
object OpqProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val (m, subDim, c) = (8, 8, 8)
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
    val plainCb = Similarity.trainPqCodebooks(
      train, "vec_id", "embedding", m, subDim, c, iters = 2)
    val (r, opqCb) = Similarity.trainOpqRotation(
      train, "vec_id", "embedding", m, subDim, c, opqIters = 4, pqIters = 2)

    val all = e.orderBy("vec_id").collect()
      .map(row => row.getLong(0) -> row.getSeq[Float](1).toArray)
    val vecs = all.map(_._2)
    val dPq = Similarity.pqReconstructionMse(vecs, plainCb, m, subDim)
    val dOpq = Similarity.pqReconstructionMse(
      vecs.map(Similarity.rotateDriver(_, r)), opqCb, m, subDim)

    // exact L2 ground truth for the first 32 ids (rotation is
    // orthogonal, so L2 neighbors are identical in both spaces)
    def exactTopK(qid: Long, q: Array[Float]): Set[Long] =
      all.filter(_._1 != qid).map { case (id, v) =>
        var d = 0.0; var i = 0
        while (i < v.length) {
          val x = q(i).toDouble - v(i).toDouble; d += x * x; i += 1
        }
        (d, id)
      }.sortBy(identity).take(k).map(_._2).toSet
    val qIds = all.take(32).map(_._1).toSet
    val truth = all.take(32).map { case (id, v) => id -> exactTopK(id, v) }.toMap

    def recall(queries: org.apache.spark.sql.DataFrame,
        corpus: org.apache.spark.sql.DataFrame, vecCol: String,
        cb: Array[Array[Float]]): Double = {
      val got = Similarity.pqAdcTopK(
          queries, "vec_id", vecCol, corpus, "vec_id", vecCol, cb, m, subDim, k)
        .collect().map(row => row.getLong(0) -> row.getLong(1))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
      val rs = truth.map { case (q, t) =>
        (t & got.getOrElse(q, Set.empty)).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val qPlain = e.filter(col("vec_id").isin(qIds.toSeq: _*))
    val rPq = recall(qPlain, e, "embedding", plainCb)
    val rot = Similarity.rotateVec(col("embedding"), r)
    val eRot = e.select(col("vec_id"), rot.as("remb"))
    val rOpq = recall(
      eRot.filter(col("vec_id").isin(qIds.toSeq: _*)), eRot, "remb", opqCb)

    println(f"| corpus | dist PQ | dist OPQ | margin | recall@$k PQ | recall@$k OPQ |")
    println(f"| ${all.length} | $dPq%.4f | $dOpq%.4f | ${(1 - dOpq / dPq) * 100}%.1f%% | $rPq%.3f | $rOpq%.3f |")
    println(
      f"""{"corpus":${all.length},"dist_pq":$dPq%.5f,"dist_opq":$dOpq%.5f,"margin_pct":${(1 - dOpq / dPq) * 100}%.2f,"recall_pq":$rPq%.3f,"recall_opq":$rOpq%.3f}""")
    spark.stop()
  }
}
