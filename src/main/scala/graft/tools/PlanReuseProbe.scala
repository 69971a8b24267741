package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: how much of a repeat run is per-run plan construction +
  * analysis (saved by reusing the DataFrame, as a resident engine's
  * prepared plan would) vs optimization/execution (paid per action
  * either way)? min-of-3 each, interleaved.
  *
  * The third mode, `prepared`, re-executes one QueryExecution's cached
  * toRdd. Its min is a DECOMPOSITION datum ONLY — never a bench mode:
  * Spark registers shuffle map outputs per RDD graph, so re-running
  * the same toRdd SKIPS every map stage (scan, exchange write, sort)
  * and times just the post-shuffle final stage. The gap
  * (reuse − prepared) therefore isolates optimizer + map-stage cost;
  * billing `prepared` as the query wall would be claiming a run that
  * never re-read the data. (Bench's prepared-plan reuse rebuilds the
  * write command per run, which re-plans and re-runs ALL stages —
  * only construction + analysis are shared.)
  *
  *   runMain graft.tools.PlanReuseProbe <sfDir> <query> [reps]
  */
object PlanReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    val fn = graft.SparkEntry.queries(name)
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    force(fn(spark, sfDir))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val rebuilt = (0 until reps).map(_ => time(force(fn(spark, sfDir))))
    val df = fn(spark, sfDir)
    val reused = (0 until reps).map(_ => time(force(df)))
    // full prepared-statement execution: optimizer + physical planning
    // run once (lazy vals on the one QueryExecution), each rep only
    // submits and runs the job DAG, consuming every row
    val rdd = df.queryExecution.toRdd
    val prepared = (0 until reps).map(_ => time(
      rdd.foreachPartition(it => while (it.hasNext) { val _ = it.next() })))
    println(f"[reuse] $name rebuild  min=${rebuilt.min}%.3f runs=${rebuilt.map(v => f"$v%.3f").mkString(",")}")
    println(f"[reuse] $name reuse    min=${reused.min}%.3f runs=${reused.map(v => f"$v%.3f").mkString(",")}")
    println(f"[reuse] $name prepared min=${prepared.min}%.3f runs=${prepared.map(v => f"$v%.3f").mkString(",")}")
    spark.stop()
  }
}
