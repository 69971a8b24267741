package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the r12 broadcast as-of route: prints the chosen
  * strategy, the formatted physical plan, and min-of-3 walls for a
  * SparkEntry query. usage: BcProbe [sfDir] [query] */
object BcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val query = args.lift(1).getOrElse("q_pit_join_single")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    val df = graft.SparkEntry.queries(query)(spark, sfDir)
    println(s"== session static? ${df.sparkSession.conf.getOption("graft.internal.staticSession")}")
    println(s"== optimized entity stats route check: " +
      graft.sources.Tables.read(spark, sfDir, "orders")
        .queryExecution.optimizedPlan.stats.sizeInBytes)
    df.explain("formatted")
    def force(): Unit = df.write.format("noop").mode("overwrite").save()
    val walls = (1 to 4).map { i =>
      val t0 = System.nanoTime(); force(); (System.nanoTime() - t0) / 1e9
    }
    println(f"walls=${walls.map(w => f"$w%.3f").mkString(",")} min=${walls.min}%.3f")
    spark.stop()
  }
}
