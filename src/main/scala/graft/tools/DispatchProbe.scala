package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r16): where does the per-job dispatch floor go? Forces a
  * 1-row noop write in a tight loop (the same floor probe the bench
  * uses) and prints per-iteration walls — run it under JFR to attribute
  * the ~40–60 ms/job local-mode floor that multiplies into every
  * multi-job query (dedup runs 9 jobs).
  *
  *   runMain graft.tools.DispatchProbe [iters]
  */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = spark.range(1).toDF("graft_floor_probe")
    def force(): Unit =
      probe.write.format("noop").mode("overwrite").save()
    force()
    val walls = (1 to iters).map { _ =>
      val t0 = System.nanoTime(); force(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[dispatch] iters=$iters min=${walls.min}%.4f " +
      f"p50=${walls.sorted.apply(iters / 2)}%.4f max=${walls.max}%.4f " +
      f"total=${walls.sum}%.2f")
    spark.stop()
  }
}
