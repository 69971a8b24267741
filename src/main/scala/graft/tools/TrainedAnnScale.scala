package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Trained IVF-PQ lifecycle scaling split (VERDICT r11 #5): TRAIN
  * (k-means cells + PQ codebooks over the BOUNDED hash-ordered sample)
  * / ENCODE (one corpus scan → cell-partitioned code table) / PROBE
  * (bounded query batch against the persisted index), each timed
  * separately at 1× and N× so the per-corpus-version costs (train,
  * encode) never blend into the per-batch cost (probe) — the IndexScale
  * discipline for the r11 trained-ANN centerpiece. Backs SURVEY §8.8.
  *
  *   spark-submit --class graft.tools.TrainedAnnScale <jar> <baseDir> <scaledDir> [factor]
  *   (scaledDir's embeddings replica comes from a prior ScaleCheck run)
  */
object TrainedAnnScale {

  private val Cells = 16; private val Probe = 4
  private val M = 8; private val SubDim = 8; private val C = 8; private val K = 5

  def main(args: Array[String]): Unit = {
    val baseDir = args(0)
    val scaledDir = args(1)
    val factor = args.lift(2).getOrElse("100")
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

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def split(dir: String): (Double, Double, Double) = {
      val path = s"/tmp/graft_annscale_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.queries.TmpSweeper.register(path)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      // TRAIN: bounded deterministic samples (the 100 TB contract —
      // cost is sample-bound, not corpus-bound)
      val tt0 = System.nanoTime()
      val train = e.orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(math.max(Cells * 64, 4096))
      val cells = Similarity.kmeansCentroids(
          train, "vec_id", "embedding", Cells, iters = 2)
        .map { case (id, v) => id -> v.map(_.toFloat).toArray }
      val cb = Similarity.trainPqCodebooks(
        train, "vec_id", "embedding", M, SubDim, C, iters = 2)
      val tTrain = (System.nanoTime() - tt0) / 1e9
      // ENCODE: one corpus scan → cell-partitioned narrow code table
      val te0 = System.nanoTime()
      Similarity.ivfPqBuildIndex(e, "vec_id", "embedding", cells, cb, M, SubDim)
        .write.partitionBy("cell").mode("overwrite").parquet(s"$path/idx")
      val tEncode = (System.nanoTime() - te0) / 1e9
      // PROBE: per-batch cost — index LOAD (listing, pruned to probed
      // cells) is part of what a batch pays, inside the timer
      def probeOnce(): Double = {
        val tp0 = System.nanoTime()
        val idx = spark.read.parquet(s"$path/idx")
        val q = e.filter(col("vec_id") < 32)
        force(Similarity.ivfPqSearchIndex(idx, q, "vec_id", "embedding",
          cells, cb, k = K, nProbe = Probe, m = M, subDim = SubDim))
        (System.nanoTime() - tp0) / 1e9
      }
      val tProbe = math.min(probeOnce(), probeOnce())
      (tTrain, tEncode, tProbe)
    }

    split(baseDir) // warm: codegen + analyzer JIT, off the books
    val (t1, e1, p1) = split(baseDir)
    System.err.println(f"[annscale] 1x train=$t1%.2f encode=$e1%.2f probe=$p1%.2f")
    val (tn, en, pn) = split(scaledDir)
    System.err.println(f"[annscale] ${factor}x train=$tn%.2f encode=$en%.2f probe=$pn%.2f")
    println(f"""{"factor":$factor,"train":{"t1":$t1%.2f,"t$factor":$tn%.2f,"wall_ratio":${tn / t1}%.2f},"encode":{"t1":$e1%.2f,"t$factor":$en%.2f,"wall_ratio":${en / e1}%.2f},"probe":{"t1":$p1%.2f,"t$factor":$pn%.2f,"wall_ratio":${pn / p1}%.2f}}""")
    spark.stop()
  }
}
