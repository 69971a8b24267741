package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Bench diagnosis aid: run each headline query after the Bench warmup
  * and report PER-QUERY Spark job counts and per-job wall times — the
  * fixed-cost floors (N jobs × 0.3-0.5 s scheduling/IO minimum at toy
  * sf) that dominate the local-mode bench total. Not part of any gate;
  * a profiling harness for deciding whether a query's wall is plan work
  * or job-count floor.
  *
  *   spark-submit --class graft.tools.BenchProbe <jar> [sfDir] [q1 q2 ...]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_pit_join_single", "q_pit_join_multi", "q_materialize_roundtrip",
      "q_online_multiget", "q_agg_pushdown", "q_window_topk",
      "q_dedup_minhash", "q_ann_brute_force", "q_text_stats")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]() // id -> (start, end)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time, -1L))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.computeIfPresent(j.jobId, (_, v) => (v._1, j.time))
    })

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // same warmup policy as Bench: absorb one-time JVM/codegen costs
    names.foreach { n =>
      try force(graft.SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[probe] warm $n: ${e.getMessage}") }
    }

    names.foreach { n =>
      // the listener bus is async: give straggler events from the
      // previous query time to drain before clearing (best-effort — a
      // public waitUntilEmpty doesn't exist; 200 ms covers the bus at
      // local-mode event rates, and this is a diagnostic tool, not a gate)
      Thread.sleep(200); jobs.clear()
      val t0 = System.nanoTime()
      try force(graft.SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[probe] $n: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the final JobEnd land before reading
      import scala.jdk.CollectionConverters._
      val spans = jobs.asScala.values.toSeq.filter(_._2 > 0)
        .map { case (s, e) => (e - s) / 1e3 }.sorted.reverse
      println(f"$n%-28s wall=$wall%6.2fs jobs=${spans.size}%3d " +
        f"jobSum=${spans.sum}%6.2fs top5=[${spans.take(5).map(d => f"$d%.2f").mkString(", ")}]")
    }
    spark.stop()
  }
}
