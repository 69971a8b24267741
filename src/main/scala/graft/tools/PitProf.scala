package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage profile of a SparkEntry query at a given SF dir (default
  * q_pit_join_single at sf0.1 — VERDICT r2 next #1c): localizes where
  * the bench wall goes — scan, checkpoint, aggregation, join, or
  * driver gaps between stages.
  *
  * usage: PitProf [sfDir] [queryName]
  */
object PitProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val query = args.lift(1).getOrElse("q_pit_join_single")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val cpu = si.taskMetrics.executorRunTime / 1e3
        println(f"    [stage ${si.stageId}%3d] wall=$wall%6.2fs taskSum=$cpu%7.2fs " +
          f"tasks=${si.numTasks} ${si.name.take(70)}")
      }
    })
    def force(): Unit = graft.SparkEntry.queries(query)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    t("warm")(force())
    println("---- timed run ----")
    t(query.take(14))(force())
    spark.stop()
  }
}
