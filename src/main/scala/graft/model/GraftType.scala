package graft.model

import org.apache.spark.sql.types._

/** Closed value-type universe of the engine: 8 scalars + their list
  * variants, mirroring the reference's ValueType enum
  * (reference: sdk/python/feast/value_type.py:19-40 and
  * protos/feast/types/Value.proto:25-96). Inside the engine everything
  * stays a native Spark column; this ADT exists for registry metadata,
  * validation, and the online-store boundary.
  */
sealed abstract class GraftType(val name: String) extends Serializable {
  def sparkType: DataType
}

object GraftType {
  case object Bytes extends GraftType("BYTES") { val sparkType: DataType = BinaryType }
  case object Str extends GraftType("STRING") { val sparkType: DataType = StringType }
  case object Int32 extends GraftType("INT32") { val sparkType: DataType = IntegerType }
  case object Int64 extends GraftType("INT64") { val sparkType: DataType = LongType }
  case object Dbl extends GraftType("DOUBLE") { val sparkType: DataType = DoubleType }
  case object Flt extends GraftType("FLOAT") { val sparkType: DataType = FloatType }
  case object Bool extends GraftType("BOOL") { val sparkType: DataType = BooleanType }
  /** Stored as epoch int64 on the reference wire (Value.proto:58); a
    * native TimestampType column here. */
  case object UnixTimestamp extends GraftType("UNIX_TIMESTAMP") { val sparkType: DataType = TimestampType }

  final case class ListOf(element: GraftType) extends GraftType(element.name + "_LIST") {
    require(!element.isInstanceOf[ListOf], "nested lists deeper than 1 are not supported")
    val sparkType: DataType = ArrayType(element.sparkType)
  }

  /** Placeholder for an entity registered before its type is known; the
    * reference's ValueType.UNKNOWN (value_type.py:21). Resolved during
    * applyFeatureView by inference from the view's source schema — never
    * a legal column/feature type. */
  case object Unknown extends GraftType("UNKNOWN") { val sparkType: DataType = NullType }

  val scalars: Seq[GraftType] =
    Seq(Bytes, Str, Int32, Int64, Dbl, Flt, Bool, UnixTimestamp)
  val all: Seq[GraftType] = scalars ++ scalars.map(ListOf(_))

  def fromName(n: String): GraftType =
    (all :+ Unknown).find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown GraftType: $n"))

  /** Spark DataType -> GraftType (inference direction). Types outside the
    * closed set (decimal, map, struct, date, interval) are rejected, as in
    * the reference's type_map (sdk/python/feast/type_map.py:73-156). */
  def fromSpark(dt: DataType): GraftType = dt match {
    case BinaryType => Bytes
    case StringType => Str
    case IntegerType | ShortType | ByteType => Int32
    case LongType => Int64
    case DoubleType => Dbl
    case FloatType => Flt
    case BooleanType => Bool
    case TimestampType | TimestampNTZType => UnixTimestamp
    case ArrayType(el, _) =>
      val inner = fromSpark(el)
      require(!inner.isInstanceOf[ListOf], s"nested list type not supported: $dt")
      ListOf(inner)
    case other =>
      throw new IllegalArgumentException(s"unsupported Spark type for a feature: $other")
  }
}
