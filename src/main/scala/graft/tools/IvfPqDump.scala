package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: sizes of the generated code for q_ann_ivfpq. */
object IvfPqDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)
    val df = graft.queries.VectorQueries.annIvfPq(spark, sfDir)
    val qe = df.queryExecution
    println(s"analyzed  len: ${qe.analyzed.toString.length}")
    val opt = qe.optimizedPlan
    println(s"optimized len: ${opt.toString.length}")
    val sizes = opt.map(p => (p.nodeName,
      p.expressions.map(e => e.treeString.length).sum))
    sizes.sortBy(-_._2).take(8).foreach { case (n, el) =>
      println(f"node $n%-30s exprTree=$el") }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/opt_plan.txt"),
      opt.treeString)
    println("done")
  }
}
