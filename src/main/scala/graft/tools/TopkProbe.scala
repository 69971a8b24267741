package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (r16): BoundedMinK bounded-heap top-k vs the row_number()
  * formulation that Spark ≥3.5 plans with a MAP-SIDE WindowGroupLimit
  * (InferWindowGroupLimit, windowGroupLimitThreshold default 1000) —
  * both shuffle ≤ k rows per (key, map task); the question is the
  * per-row constant: ObjectHashAggregate's per-row hash-map machinery
  * (JFR: dominant) vs a codegen radix sort + linear group-limit pass.
  *
  *   runMain graft.tools.TopkProbe <sfDir> [reps]
  */
object TopkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // bench runs this query static
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def heapVariant(): DataFrame =
      graft.SparkEntry.queries("q_window_topk")(spark, sfDir)

    def windowVariant(): DataFrame = {
      val o = graft.sources.Tables.read(spark, sfDir, "orders")
        .filter(col("o_totalprice").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rk").cast("int").as("rk"))
    }

    // result parity first (order-insensitive): the two variants must
    // agree bit-for-bit before any timing matters
    val a = heapVariant()
    val b = windowVariant()
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[topkprobe] result diff rows = $diff (must be 0)")
    // ADVICE r16: a parity probe that times past a mismatch can be
    // scrolled over — fail loudly before any timing matters
    require(diff == 0, s"topk variants disagree: $diff differing rows")
    println("[topkprobe] window-variant plan:")
    println(b.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("WindowGroupLimit") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("Sort") || l.contains("Scan"))
      .mkString("\n"))

    def time(tag: String, mk: () => DataFrame): Unit = {
      force(mk()) // cold
      val walls = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); force(mk()); (System.nanoTime() - t0) / 1e9
      }
      println(f"[topkprobe] $tag%-8s min=${walls.min}%.3f runs=" +
        walls.map(w => f"$w%.3f").mkString("/"))
    }
    // interleave to split box drift across both variants
    time("heap", heapVariant _)
    time("window", windowVariant _)
    time("heap", heapVariant _)
    time("window", windowVariant _)
    spark.stop()
  }
}
