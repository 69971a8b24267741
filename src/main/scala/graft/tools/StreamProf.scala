package graft.tools
import org.apache.spark.sql.SparkSession
object StreamProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 0.15)
          println(f"    [stage ${si.stageId}%3d] wall=$wall%6.2fs tasks=${si.numTasks} ${si.name.take(55)}")
      }
    })
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("warm")(force(graft.SparkEntry.queries("q_agg_pushdown")(spark, "/root/testdata/sf0.1")))
    val target = sys.env.getOrElse("STREAMPROF_QUERY", "q_stream_materialize")
    t("run1")(force(graft.SparkEntry.queries(target)(spark, "/root/testdata/sf0.1")))
    t("run2")(force(graft.SparkEntry.queries(target)(spark, "/root/testdata/sf0.1")))
    spark.stop()
  }
}
