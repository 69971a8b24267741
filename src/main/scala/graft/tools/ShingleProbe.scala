package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val step = args.headOption.getOrElse("full")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    val d = graft.sources.Tables.read(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text")).repartition(32)
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val t0 = System.nanoTime()
    step match {
      case "words" => force(d.select(col("doc_id"), TF.words(col("text")).as("w")))
      case "ngrams" => force(d.withColumn("__w", TF.words(col("text")))
        .select(col("doc_id"), TF.wordNgramsFromWords(col("__w"), 3).as("sh")))
      case "ngrams_nodistinct" =>
        val w = col("__w")
        val grams = transform(sequence(lit(1), size(w) - lit(2)),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
        force(d.withColumn("__w", TF.words(col("text")))
          .select(col("doc_id"), when(size(w) < 3, array().cast("array<string>")).otherwise(grams).as("sh")))
      case "elemhash" => force(d.withColumn("__w", TF.words(col("text")))
        .select(col("doc_id"), transform(TF.wordNgramsFromWords(col("__w"), 3), e => xxhash64(e)).as("h")))
      case "explainA" =>
        val raw = graft.sources.Tables.read(spark, "/root/testdata/sf0.1", "documents")
          .select(col("doc_id"), col("text"))
        val uni = raw.unionByName(raw.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val sh0 = uni.repartition(32).withColumn("__w", TF.words(col("text")))
          .select(col("doc_id").as("id"), TF.wordNgramsFromWords(col("__w"), 3).as("shingles"))
          .filter(size(col("shingles")) > 0)
        sh0.explain("formatted")
    }
    println(f"$step%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    spark.stop()
  }
}
