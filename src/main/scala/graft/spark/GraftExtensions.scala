package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnShim

import graft.functions.{BoundedMinK, DotProduct, MinHashBandHashes, MinHashSignature, SearchSorted, SimHash64}

/** SQL surface for the engine's native expressions, exposed two ways:
  *
  *  - `spark.sql.extensions=graft.spark.GraftExtensions` registers them
  *    at session build time (the standard library-extension mechanism);
  *  - `GraftFunctions.register(spark)` injects them into an already-
  *    running session.
  *
  * Functions (element hashes = `transform(arr, x -> xxhash64(x))`):
  *   minhash_signature(elemHashes, k)            -> array<bigint>
  *   minhash_band_hashes(elemHashes, k, bands)   -> array<bigint>
  *   simhash64(elemHashes)                       -> bigint
  *   vec_dot(a, b)                               -> double
  *   bounded_min_k(value, k)  [aggregate]        -> array<value type>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument $pos must be an integer literal, got $other")
  }

  private[spark] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature(elemHashes, k)")
        MinHashSignature(args(0), intArg(args(1), "minhash_signature", 2))
      }),
    ("minhash_band_hashes",
      new ExpressionInfo(classOf[MinHashBandHashes].getName, "minhash_band_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_band_hashes(elemHashes, k, bands)")
        MinHashBandHashes(args(0),
          intArg(args(1), "minhash_band_hashes", 2),
          intArg(args(2), "minhash_band_hashes", 3))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(elemHashes)")
        SimHash64(args(0))
      }),
    ("vec_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b)")
        DotProduct(args(0), args(1))
      }),
    ("search_sorted",
      new ExpressionInfo(classOf[SearchSorted].getName, "search_sorted"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "search_sorted(value, boundsArrayLiteral)")
        require(args(1).foldable, "search_sorted bounds must be a literal array")
        val at = args(1).dataType match {
          case a: org.apache.spark.sql.types.ArrayType => a
          case other => throw new IllegalArgumentException(
            s"search_sorted bounds must be an array, got $other")
        }
        val arr = args(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(at.elementType)
        SearchSorted(args(0), arr.toObjectArray(at.elementType).toIndexedSeq.sorted(ord))
      }),
    ("bounded_min_k",
      new ExpressionInfo(classOf[BoundedMinK].getName, "bounded_min_k"),
      (args: Seq[Expression]) => {
        // an AggregateFunction returned bare, like the built-in
        // aggregates' registry entries — the analyzer wraps it
        require(args.length == 2, "bounded_min_k(value, k)")
        BoundedMinK(args(0), intArg(args(1), "bounded_min_k", 2))
      }))

  /** Register into a live session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, info, builder) =>
      ColumnShim.registerFunction(spark, name, info, builder)
    }
}
