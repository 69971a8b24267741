package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: measure every bench headline query min-of-3 with AQE ON
  * vs OFF (runtime conf toggle, same session) to decide a per-query
  * adaptive policy — r6 verdict ask #4 follow-up: AQE-off globally
  * hurts the suite (6.4s vs 5.4s) but the PIT pair's gap is AQE
  * stage-dispatch floor. Dev-tool only.
  *
  *   runMain graft.tools.AqeProbe <sfDir>
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)

    val headline = Seq(
      "q_pit_join_single", "q_pit_join_multi",
      "q_materialize_roundtrip", "q_online_multiget",
      "q_stream_materialize",
      "q_agg_pushdown", "q_window_topk",
      "q_dedup_minhash", "q_ann_brute_force", "q_text_stats")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm mirrors only Bench's table-schema + multiget-store stages —
    // NOT its full q_agg_pushdown/dedup-pipeline/PIT-shape warms. The
    // one-time analyzer JIT of the unwarmed shapes lands in each
    // query's first AQE-ON run; min-of-3 absorbs it in the headline,
    // but single-run on/off deltas carry that cold-run noise in the ON
    // arm only.
    Seq("orders", "lineitem", "events", "documents", "embeddings")
      .foreach(t => graft.sources.Tables.read(spark, sfDir, t).schema)
    try force(graft.SparkEntry.queries("q_online_multiget")(spark, sfDir))
    catch { case e: Throwable => System.err.println(s"warm: ${e.getMessage}") }

    def minOf3(name: String, aqe: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => System.err.println(s"$name: ${e.getMessage}"); -1.0 }
      }
      val rs = Seq(once(), once(), once()).filter(_ >= 0)
      if (rs.isEmpty) -1.0 else rs.min
    }

    // interleave on/off per query so box drift hits both arms equally
    val rows = headline.map { q => (q, minOf3(q, aqe = true), minOf3(q, aqe = false)) }
    println(f"${"query"}%-28s ${"aqeON"}%8s ${"aqeOFF"}%8s  delta")
    rows.foreach { case (q, on, off) =>
      println(f"$q%-28s $on%8.3f $off%8.3f  ${on - off}%+.3f")
    }
    // a query whose 3 runs all failed carries the -1.0 sentinel — keep
    // it visible per-row above but OUT of the totals
    val ok = rows.filter(r => r._2 >= 0 && r._3 >= 0)
    if (ok.size < rows.size)
      System.err.println(s"[probe] ${rows.size - ok.size} queries failed all runs; excluded from totals")
    val (ton, toff) = (ok.map(_._2).sum, ok.map(_._3).sum)
    println(f"TOTAL on=$ton%.3f off=$toff%.3f bestMix=${ok.map(r => math.min(r._2, r._3)).sum}%.3f")
    spark.stop()
  }
}
