package graft.tools
import org.apache.spark.sql.SparkSession
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    import spark.implicits._
    val warmDocs = (0 until 50)
      .map(i => (i.toLong, s"warm doc number $i with some shared filler tokens to shingle"))
      .toDF("doc_id", "text")
    t("warmup")(force(graft.functions.Dedup.minhashNearDupPairs(warmDocs, "doc_id", "text", 3, 32, 8, 0.9)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    t("dedup_nocodegen")(force(graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.1")))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    t("dedup_run1")(force(graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.1")))
    t("dedup_run2")(force(graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.1")))
    t("simhash_run1")(force(graft.SparkEntry.queries("q_dedup_simhash")(spark, "/root/testdata/sf0.1")))
    t("simhash_run2")(force(graft.SparkEntry.queries("q_dedup_simhash")(spark, "/root/testdata/sf0.1")))
    spark.stop()
  }
}
