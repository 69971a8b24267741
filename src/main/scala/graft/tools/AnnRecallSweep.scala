package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** IVF recall-vs-nProbe operating curve (dev tool, the r14 verdict's
  * optional ask #7): builds the IVF index ONCE over the embeddings
  * table, takes a deterministic query batch, computes exact
  * brute-force ground truth, then sweeps nProbe measuring recall@k
  * and the per-sweep search wall — the table an operator reads to
  * pick nProbe for a latency/recall budget. The index build is
  * deliberately OUTSIDE the per-probe timer (train-once/search-many
  * is the artifact lifecycle `q_ann_ivf_persisted` pins); the searched
  * artifacts are the exact `ivfBuildIndex` frames the production
  * queries persist.
  *
  *   runMain graft.tools.AnnRecallSweep [sfDir] [k] [nCells]
  */
object AnnRecallSweep {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nCells = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpusN = emb.count()
    // deterministic query batch, same ids at every scale factor prefix
    val queries = emb.filter(col("vec_id") % 100 === 7).limit(48)
      .localCheckpoint()
    val nQ = queries.count()

    // exact ground truth (one bounded-heap pass — the measured floor
    // of the sweep is also the brute-force wall to beat)
    val tTruth = System.nanoTime()
    val truth = Similarity.bruteForceTopK(
        queries, "vec_id", "embedding", emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truthWall = (System.nanoTime() - tTruth) / 1e9

    val tBuild = System.nanoTime()
    val (anchors0, assigned0) =
      Similarity.ivfBuildIndex(emb, "vec_id", "embedding", nCells)
    val anchors = anchors0.localCheckpoint()
    val assigned = assigned0.localCheckpoint()
    val buildWall = (System.nanoTime() - tBuild) / 1e9

    println(s"\nIVF recall@k=$k vs nProbe — sfDir=$dir corpus=$corpusN " +
      f"queries=$nQ cells=$nCells (index build $buildWall%.2f s, " +
      f"brute-force truth $truthWall%.2f s)")
    println("| nProbe | recall@k | search s | vs brute |")
    println("|---|---|---|---|")
    val rows = Seq(1, 2, 4, 8, 16).filter(_ <= nCells).map { nProbe =>
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val got = Similarity.ivfSearchIndex(
            queries, "vec_id", "embedding", anchors, assigned,
            "vec_id", "embedding", k, nProbe)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val wall = (System.nanoTime() - t0) / 1e9
        val recall = truth.iterator.map { case (q, t) =>
          got.getOrElse(q, Set.empty).count(t).toDouble / t.size
        }.sum / truth.size
        (recall, wall)
      }
      once() // warm the plan shape for this nProbe, off the books
      val (recall, wall) = once()
      println(f"| $nProbe | $recall%.3f | $wall%.3f | ${wall / truthWall}%.2fx |")
      (nProbe, recall, wall)
    }
    val json = rows.map { case (p, r, w) =>
      f"""{"nprobe":$p,"recall":$r%.3f,"search_s":$w%.3f}""" }.mkString(",")
    println(
      f"""{"k":$k,"cells":$nCells,"corpus":$corpusN,"queries":$nQ,"brute_s":$truthWall%.3f,"build_s":$buildWall%.3f,"sweep":[$json]}""")
    spark.stop()
  }
}
