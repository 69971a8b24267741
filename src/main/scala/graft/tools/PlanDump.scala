package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry query
  * against a data dir WITHOUT executing it — for auditing join
  * strategies / exchanges on scaled replicas where a bad static choice
  * (e.g. a misestimated broadcast of a corpus-sized frame) only shows
  * up at N×.
  *
  *   runMain graft.tools.PlanDump <sfDir> <query>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    // initial (pre-AQE) physical plan: what the static planner commits
    // to before any runtime re-optimization can rescue it
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
