package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: run the IVF / k-means / ADC plans with
  * `spark.sql.codegen.fallback=false`, so any generated-code failure
  * (janino "Code grows beyond 64 KB") throws instead of silently
  * degrading the stage to interpreted mode. Not part of any gate.
  *
  *   spark-submit --class graft.tools.CodegenCheck <jar> [nCells] [dim]
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val nCells = args.lift(0).map(_.toInt).getOrElse(8)
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.Similarity

    val rnd = new scala.util.Random(3)
    val centers = Array.fill(nCells)(Array.fill(dim)(rnd.nextGaussian() * 5))
    val corpus = (0 until nCells * 50).map { i =>
      val c = centers(i % nCells)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 10)

    def check(name: String)(body: => org.apache.spark.sql.DataFrame): Unit =
      try { body.write.format("noop").mode("overwrite").save(); println(s"OK   $name") }
      catch { case e: Throwable =>
        println(s"FAIL $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(300)}")
      }

    check("ivfTopK kmeans")(Similarity.ivfTopK(queries, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5, nCells = nCells, nProbe = 2, kmeansIters = 3))
    check("ivfTopK first-n")(Similarity.ivfTopK(queries, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5, nCells = nCells, nProbe = 2, kmeansIters = 0))
    check("ivfPqTopK")(Similarity.ivfPqTopK(queries, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5, nCells = nCells, nProbe = 2,
      m = 4, subDim = dim / 4))
    check("pqAdcTopK")(Similarity.pqAdcTopK(queries, "vec_id", "embedding",
      corpus, "vec_id", "embedding",
      anchors = centers.map(_.map(_.toFloat)), m = 4, subDim = dim / 4, k = 5))
    spark.stop()
  }
}
