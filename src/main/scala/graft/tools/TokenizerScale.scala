package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, TextFunctions => TF, UnigramLm}

/** Train-vs-encode scaling split for the persisted tokenizer lifecycle
  * (q_unigram_encode_persisted / q_bpe_encode_persisted) — dev tool
  * backing SURVEY §8.8 (r13 verdict ask #1: the fused encode re-paid
  * the EM train per call; the persisted path must make encode track
  * the BATCH, never rounds × corpus).
  *
  * For each dir: time TRAIN (unigram `model` — full EM — written as
  * the parquet artifact; BPE merge rounds likewise), then time ENCODE
  * twice from the artifact alone (read costs/merges, segment the word
  * table, join back to documents, noop force) and report the min. A
  * third row times the INCREMENTAL encode: a FIXED batch (the base
  * corpus's doc_id % 10 slice, same at every factor) encoded under
  * the scaled-corpus artifact — its wall staying ~flat across factors
  * is the point of the persisted lifecycle.
  *
  *   spark-submit --class graft.tools.TokenizerScale <jar> <baseDir> <scaledDir> [factor]
  *   (scaledDir's documents replica comes from a prior ScaleCheck run)
  */
object TokenizerScale {

  def main(args: Array[String]): Unit = {
    val baseDir = args(0)
    val scaledDir = args(1)
    val factor = args.lift(2).getOrElse("10")
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

    // the PRODUCTION tail, not a private near-copy: the tool must time
    // the exact plan shape q_unigram_encode_persisted ships (a routing
    // change in the query layer must move these ratios — review r14)
    def docStats(d: DataFrame, wsym: DataFrame): DataFrame =
      graft.queries.CorpusQueries.docTokenStats(d, wsym)

    val fixedBatch = spark.read.parquet(s"$baseDir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 8000000L).as("doc_id"), col("text"))

    def split(dir: String): (Double, Double, Double) = {
      val path = s"/tmp/graft_tokscale_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.queries.TmpSweeper.register(path)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val tb0 = System.nanoTime()
      UnigramLm.model(d, "text").write.parquet(s"$path/unigram")
      Bpe.trainMerges(d, "text", 3).write.parquet(s"$path/bpe")
      val train = (System.nanoTime() - tb0) / 1e9
      def encodeOnce(batch: DataFrame): Double = {
        // artifact LOAD (listing + bounded collect) is part of what a
        // per-batch encode pays — inside the timer, not setup
        val tp0 = System.nanoTime()
        val costs = spark.read.parquet(s"$path/unigram").select("piece", "cost")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        force(docStats(batch,
          UnigramLm.encodeWordsWithModel(batch, "text", costs)))
        (System.nanoTime() - tp0) / 1e9
      }
      val encode = math.min(encodeOnce(d), encodeOnce(d))
      val incr = math.min(encodeOnce(fixedBatch), encodeOnce(fixedBatch))
      (train, encode, incr)
    }

    split(baseDir) // warm: codegen + analyzer JIT, off the books
    val (t1, e1, i1) = split(baseDir)
    System.err.println(f"[tokscale] 1x train=$t1%.2f encode=$e1%.2f incr=$i1%.2f")
    val (tn, en, in) = split(scaledDir)
    System.err.println(f"[tokscale] ${factor}x train=$tn%.2f encode=$en%.2f incr=$in%.2f")
    println(f"""{"factor":$factor,"train":{"t1":$t1%.2f,"t$factor":$tn%.2f,"wall_ratio":${tn / t1}%.2f},"encode":{"t1":$e1%.2f,"t$factor":$en%.2f,"wall_ratio":${en / e1}%.2f},"incr_batch":{"t1":$i1%.2f,"t$factor":$in%.2f,"wall_ratio":${in / i1}%.2f}}""")
    spark.stop()
  }
}
