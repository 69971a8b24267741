package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolate the single-row-group scan floor from aggregation
  * cost on the bench tables — the fixture's parquet files are ONE row
  * group each, so every map stage is a single task regardless of cores
  * and the per-core decode rate bounds the whole query. Dev-tool only.
  *
  *   runMain graft.tools.ScanProbe <sfDir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    def t(tag: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      println(f"[scan] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (0 until 3).foreach { i =>
      t(s"count        run=$i")(o.count())
      t(s"sum3cols     run=$i")(o.agg(sum("o_totalprice"), sum("o_custkey"),
        sum("o_orderkey")).collect())
      t(s"grp-sum      run=$i")(noop(
        o.groupBy("o_custkey").agg(sum("o_totalprice"))))
      t(s"grp-minheap  run=$i")(noop(
        o.filter(col("o_totalprice").isNotNull).groupBy("o_custkey")
          .agg(graft.functions.BoundedMinK.column(
            struct((-col("o_totalprice")).as("np"), col("o_orderkey").as("ok"),
              col("o_totalprice").as("price")), 3).as("t"))))
      t(s"grp-minheap-preproj run=$i")(noop(
        o.filter(col("o_totalprice").isNotNull)
          .select(col("o_custkey"),
            struct((-col("o_totalprice")).as("np"), col("o_orderkey").as("ok"),
              col("o_totalprice").as("price")).as("__s"))
          .groupBy("o_custkey")
          .agg(graft.functions.BoundedMinK.column(col("__s"), 3).as("t"))))
    }
    spark.stop()
  }
}
