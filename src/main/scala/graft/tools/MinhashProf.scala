package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextFunctions => TF}
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val cpu = si.taskMetrics.executorRunTime / 1e3
        if (wall > 0.3 || cpu > 0.3)
          println(f"    [stage ${si.stageId}%3d] wall=$wall%6.2fs taskSum=$cpu%7.2fs tasks=${si.numTasks} ${si.name.take(60)}")
      }
    })
    val d = graft.sources.Tables.read(spark, "/root/testdata/sf0.1", "documents").select(col("doc_id"), col("text"))
    val uni = d.unionByName(d.filter(col("doc_id") % 10 === 0).select((col("doc_id")+1000000L).as("doc_id"), col("text")))
    def t(name: String)(f: => Long): Unit = { val t0=System.nanoTime(); val n=f; println(f"$name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  ($n rows)") }
    {
      import spark.implicits._
      val warmDocs = (0 until 50)
        .map(i => (i.toLong, s"warm doc number $i with some shared filler tokens to shingle"))
        .toDF("doc_id", "text")
      t("warmup_50docs")( Dedup.minhashNearDupPairs(warmDocs, "doc_id", "text", 3, 64, 16, 0.9).count() )
    }
    val sh0 = uni.repartition(32).withColumn("__w", TF.words(col("text")))
      .select(col("doc_id").as("id"), TF.wordNgramsFromWords(col("__w"),3).as("shingles")).filter(size(col("shingles"))>0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("A_shingle_persist")( sh0.count() )
    val banded2 = sh0.withColumn("__h", transform(col("shingles"), e => xxhash64(e)))
      .withColumn("sig", Dedup.minhashSignature(col("__h"), 64))
      .select(col("id"), posexplode(Dedup.bandHashes(col("sig"),16,4))).toDF("id","band","bucket")
    t("B_banded")( { banded2.write.format("noop").mode("overwrite").save(); 0L } )
    val buckets2 = banded2.groupBy("band","bucket").agg(collect_list("id").as("ids")).filter(size(col("ids")).between(2,1000))
    val sorted2 = array_sort(col("ids"))
    val pairs2 = buckets2.select(explode(flatten(transform(sorted2, (a,i) => transform(slice(sorted2, i+lit(2), size(sorted2)), b => struct(a.as("_1"), b.as("_2")))))).as("p")).select(col("p._1").as("id_a"), col("p._2").as("id_b")).distinct()
    t("C_pairs")( pairs2.count() )
    val verified = pairs2.join(sh0.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh0.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.999)
    t("D_verify")( verified.count() )
    t("full")( Dedup.minhashNearDupPairs(uni, "doc_id", "text", 3, 64, 16, 0.999).count() )
    spark.stop()
  }
}
