package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for MinHash signatures.
  *
  * Why not the `Column`-HOF formulation (`array((0 until k).map(i =>
  * array_min(transform(hashes, h => xxhash64(lit(i), h)))))`)? Two
  * scale problems, both measured, neither about per-row throughput:
  *
  *  1. The expression TREE is O(k) lambdas; after CollapseProject
  *     inlines it into every band slice it reaches O(k × bands) nodes.
  *     Catalyst analysis + optimization of that tree costs >10 s of
  *     driver time per query — paid before the first task launches,
  *     at any data scale.
  *  2. Spark evaluates higher-order-function lambdas interpreted, so
  *     the k passes over the element array box/unbox per element.
  *
  * A single opaque expression keeps the plan tiny (one node) and the
  * eval a tight primitive loop (k mins updated in one pass over the
  * element hashes, XXH64.hashLong per (element, i) — the same mixer
  * Spark's xxhash64 uses). CodegenFallback: the surrounding projection
  * stays whole-stage codegen'd and calls eval() once per row.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(k > 0, s"k must be positive, got $k")

  // declared input type: without it an array<int> child passed analysis
  // and getLong then read garbage across packed 4-byte slots — silently
  // wrong signatures (review r6); with it, integral arrays coerce
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // empty input has NO signature: the all-MaxValue sentinel made
    // every empty document collide perfectly in every band (review r6)
    if (arr.numElements() == 0) null
    else new GenericArrayData(MinHashSignature.mins(arr, k))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** One pass over the element hashes, maintaining all k mins. */
  private[functions] def mins(arr: ArrayData, k: Int): Array[Long] = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, j)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }
}

/** Fused signature + LSH banding: k mins computed as above, then each
  * of the `bands` groups of k/bands consecutive mins folded into one
  * 64-bit band hash. Fusing avoids re-evaluating the signature per band
  * (CodegenFallback expressions get no common-subexpression
  * elimination, so a shared signature column inlined into `bands`
  * slices would run the k-min pass `bands` times). */
case class MinHashBandHashes(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(k > 0 && bands > 0 && k % bands == 0,
    s"k=$k must be a positive multiple of bands=$bands")
  private val rowsPer = k / bands

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_band_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null // see MinHashSignature
    val mins = MinHashSignature.mins(arr, k)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // EXACTLY Spark's xxhash64(slice entries..., b) fold — seed 42,
      // entries in band order, the band index hashed LAST — so a band
      // table built from the signature-level Column pair
      // (Dedup.minhashSignature + Dedup.bandHashes) is interchangeable
      // with this fused path; the old 42+b-seeded fold produced
      // incompatible buckets and silently ZERO collisions across the
      // two public APIs (review r6)
      var acc = 42L
      var r = 0
      while (r < rowsPer) {
        acc = XXH64.hashLong(mins(b * rowsPer + r), acc)
        r += 1
      }
      out(b) = XXH64.hashLong(b.toLong, acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

/** 64-bit SimHash over pre-hashed tokens: bit j of the result is set
  * iff the +1/-1 vote sum of bit j across token hashes is positive.
  * Replaces the 64-wide zip_with/aggregate HOF fold for the same
  * reasons as MinHashSignature (plan size + interpreted lambdas). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object MinHashExpr {
  import org.apache.spark.sql.graftshim.ColumnShim

  def signature(elemHashes: Column, k: Int): Column =
    ColumnShim.column(MinHashSignature(ColumnShim.expression(elemHashes), k))

  def bandHashes(elemHashes: Column, k: Int, bands: Int): Column =
    ColumnShim.column(MinHashBandHashes(ColumnShim.expression(elemHashes), k, bands))

  def simhash64(elemHashes: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(elemHashes)))
}
