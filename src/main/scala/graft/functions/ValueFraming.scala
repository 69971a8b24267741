package graft.functions

import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.DataType

/** Shared partial→final wire framing for the bounded typed aggregates
  * ([[BoundedCollect]], Quota's BoundedMinK): values cross the boundary
  * as length-prefixed SINGLE-FIELD UnsafeRows — works uniformly for
  * every orderable type, including the struct rows topKPerKey
  * aggregates. One implementation so a framing fix (size validation,
  * buffer reuse) cannot silently diverge between the two aggregates
  * (review r12). */
private[functions] object ValueFraming {

  /** count + per-value (length, UnsafeRow bytes). `foreachValue` drives
    * iteration so each buffer type's own traversal is reused. */
  def write(out: java.io.DataOutputStream, size: Int,
      foreachValue: (Any => Unit) => Unit, valueProj: UnsafeProjection): Unit = {
    out.writeInt(size)
    foreachValue { v =>
      val row = valueProj(new GenericInternalRow(Array[Any](v)))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
  }

  /** Reads the frames written by [[write]] and hands each decoded value
    * to `consume`. The byte arrays are freshly allocated per value, so
    * consumers may keep references without copying. */
  def read(in: java.io.DataInputStream, dataType: DataType)(consume: Any => Unit): Unit = {
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(1)
      row.pointTo(b, len)
      consume(row.get(0, dataType))
      i += 1
    }
  }
}
