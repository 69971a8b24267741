package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Build-vs-probe scaling split for the persisted MinHash-LSH band
  * index (q_dedup_index_persisted) — dev tool backing SURVEY §8.8's
  * 100× row (r9 verdict ask: the whole-query ScaleCheck number blends
  * a one-time index BUILD into the N× column while the 1× column
  * probes a cached index; the split times each half honestly).
  *
  * For each dir: drop the index, time BUILD (shingle → minhash →
  * band table → write partitioned by band), then time PROBE twice
  * (load band table → batch probe join → exact-Jaccard verify →
  * noop force) and report the min. At corpus scale the build runs
  * once per corpus VERSION and the probe once per incoming BATCH, so
  * the probe ratio is the one that must stay far below N×.
  *
  *   spark-submit --class graft.tools.IndexScale <jar> <baseDir> <scaledDir> [factor]
  *   (scaledDir's documents replica comes from a prior ScaleCheck run)
  */
object IndexScale {

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
      val path = s"/tmp/graft_idxscale_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.queries.TmpSweeper.register(path)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val tb0 = System.nanoTime()
      Dedup.minhashBuildIndex(d, "doc_id", "text", shingleN = 3, k = 32, bands = 8)
        .write.mode("overwrite").partitionBy("band").parquet(s"$path/bands")
      val build = (System.nanoTime() - tb0) / 1e9
      def probeOnce(): Double = {
        // the index LOAD (listing + footer/schema read) is part of what
        // a per-batch probe pays — inside the timer, not setup
        val tp0 = System.nanoTime()
        val index = spark.read.parquet(s"$path/bands").select("id", "band", "bucket")
        val batch = d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 4000000L).as("batch_id"), col("text"))
        force(Dedup.minhashSearchIndex(index, d, "doc_id", "text",
          batch, "batch_id", "text",
          shingleN = 3, k = 32, bands = 8, threshold = 0.999))
        (System.nanoTime() - tp0) / 1e9
      }
      val probe = math.min(probeOnce(), probeOnce())
      // APPEND cost (r13: the incremental lifecycle): commit the corpus
      // once as a VersionedTable index, then time appending a FIXED
      // batch (the base corpus's doc_id % 10 slice — same batch at
      // every factor). Append must track the BATCH, not the corpus:
      // its wall ratio staying ~1 across factors is the whole point of
      // the incremental path (a rebuild pays the `build` column).
      val vdir = s"${path}_versioned"
      graft.queries.TmpSweeper.register(vdir)
      fs.delete(new org.apache.hadoop.fs.Path(vdir), true)
      Dedup.minhashIndexCommit(vdir, d, "doc_id", "text",
        shingleN = 3, k = 32, bands = 8)
      val batchFixed = spark.read.parquet(s"$baseDir/documents.parquet")
        .select((col("doc_id") + 8000000L).as("doc_id"), col("text"))
        .filter(col("doc_id") % 10 === 0)
      val ta0 = System.nanoTime()
      Dedup.minhashIndexCommit(vdir, batchFixed, "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, append = true)
      val append = (System.nanoTime() - ta0) / 1e9
      (build, probe, append)
    }

    split(baseDir) // warm: codegen + analyzer JIT, off the books
    val (b1, p1, a1) = split(baseDir)
    System.err.println(f"[indexscale] 1x build=$b1%.2f probe=$p1%.2f append=$a1%.2f")
    val (bn, pn, an) = split(scaledDir)
    System.err.println(f"[indexscale] ${factor}x build=$bn%.2f probe=$pn%.2f append=$an%.2f")
    println(f"""{"factor":$factor,"build":{"t1":$b1%.2f,"t$factor":$bn%.2f,"wall_ratio":${bn / b1}%.2f},"probe":{"t1":$p1%.2f,"t$factor":$pn%.2f,"wall_ratio":${pn / p1}%.2f},"append":{"t1":$a1%.2f,"t$factor":$an%.2f,"wall_ratio":${an / a1}%.2f}}""")
    spark.stop()
  }
}
