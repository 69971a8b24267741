package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Dev audit: for each named SparkEntry query, build (don't run) the
  * physical plan against a data dir and report every broadcast build
  * side — the leaf tables it scans and the optimizer's size estimate.
  * A broadcast whose subtree scans a corpus-sized table through an
  * explode is the misplan class that OOM'd `containmentJoin`'s first
  * 10× run (post-explode size estimates are width-ratio guesses): run
  * this against a scaled replica dir and eyeball any hit that is not a
  * provably bounded aggregate (centroids, anchors, distinct tiny keys)
  * or an engine-gated explicit broadcast.
  *
  *   runMain graft.tools.BroadcastAudit <dataDir> <q1,q2,...>
  */
object BroadcastAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        // collect() does not descend into an AdaptiveSparkPlanExec's
        // inner plan — unwrap to the current (pre-execution: initial)
        // physical plan
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        val hits = plan.collect {
          case b: BroadcastExchangeExec =>
            val leaves = b.child.collectLeaves().collect {
              case f: FileSourceScanExec =>
                f.relation.location.rootPaths.map(p =>
                  p.getName.stripSuffix(".parquet")).mkString("+")
            }
            val est = b.child.logicalLink.map(_.stats.sizeInBytes.toString)
              .getOrElse("?")
            val chain = Iterator.iterate(Option(b.child))(
                _.flatMap(_.children.headOption))
              .takeWhile(_.isDefined).flatten.map(_.nodeName).take(4)
              .mkString("<-")
            s"bcast[est=$est, ${chain}, scans=${leaves.distinct.mkString(",")}]"
          case b: BroadcastNestedLoopJoinExec =>
            s"NESTEDLOOP[${b.joinType}]"
        }
        val nBhj = plan.collect { case j: BroadcastHashJoinExec => j }.size
        println(s"[bcaudit] $name bhj=$nBhj ${hits.mkString(" ")}")
      } catch {
        case e: Throwable =>
          println(s"[bcaudit] $name FAILED_TO_PLAN ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(160)}")
      }
    }
    spark.stop()
  }
}
