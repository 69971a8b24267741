package graft.serving

import graft.serving.ProtoWire.{Reader, Writer, WtI32, WtI64, WtLen, WtVarint}

/** Message codecs for the reference serving protos, over [[ProtoWire]]:
  *
  *  - `feast.types.Value` oneof (reference protos/feast/types/
  *    Value.proto:47-67: bytes=1, string=2, int32=3, int64=4,
  *    double=5, float=6, bool=7, unix_timestamp=8, and the *_list
  *    messages at 11-18, each `repeated ... val = 1`)
  *  - `GetOnlineFeaturesRequestV2` (protos/feast/serving/
  *    ServingService.proto:60-83: features=4, entity_rows=2,
  *    project=5; EntityRow{timestamp=1, fields map=2})
  *  - `GetOnlineFeaturesResponse` (ServingService.proto:85-116:
  *    repeated FieldValues{fields map=1, statuses map=2}; FieldStatus
  *    PRESENT=1 / NULL_VALUE=2 / NOT_FOUND=3 / OUTSIDE_MAX_AGE=4)
  *  - `GetFeastServingInfoResponse` (version=1, type=2,
  *    job_staging_location=10)
  *
  * A protobuf `map<k,v>` is a repeated nested message {key=1,
  * value=2}; `google.protobuf.Timestamp` is {seconds=1 int64,
  * nanos=2 int32}. Numeric repeated fields encode PACKED (the proto3
  * default) and decode both packed and unpacked forms.
  */
object FeastProto {

  // ---- feast.types.Value ------------------------------------------

  /** Scala value -> proto Value message bytes. Null encodes as the
    * EMPTY message — proto3's "no oneof case set", which is exactly
    * how the reference renders a null feature value. */
  def encodeValue(v: Any): Writer = {
    val w = new Writer
    def packedLongs(field: Int, xs: Seq[Long]): Unit = {
      val p = new Writer; xs.foreach(p.varintRaw)
      w.msgField(field, p)
    }
    v match {
      case null => ()
      case b: Array[Byte] => w.bytesField(1, b)
      case s: String => w.stringField(2, s)
      case i: Int => w.varintField(3, i.toLong)
      case l: Long => w.varintField(4, l)
      case d: Double => w.doubleField(5, d)
      case f: Float => w.floatField(6, f)
      case b: Boolean => w.boolField(7, b)
      case t: java.sql.Timestamp => w.varintField(8, t.getTime / 1000L)
      case xs: Seq[_] => encodeList(w, xs)
      case xs: Array[_] => encodeList(w, xs.toSeq)
      case other => throw new IllegalArgumentException(
        s"unsupported feature value type ${other.getClass.getName}")
    }
    w
  }

  private def encodeList(w: Writer, xs: Seq[Any]): Unit = {
    // The list field number is chosen by inspecting ALL elements, not
    // the first one: a mixed Int/Long list must promote to Int64List
    // (first-element sniffing wrote Longs into an int32 list, which
    // the decoder then truncated — review r7). Genuinely mixed types
    // are an error, not a guess. Empty lists of unknown element type
    // encode as an empty string list (indistinguishable on the wire:
    // every list message is {repeated val = 1}).
    val body = new Writer
    def all(p: Any => Boolean): Boolean = xs.forall(p)
    val field =
      if (xs.isEmpty) 12
      else if (all(_.isInstanceOf[Array[Byte]])) 11
      else if (all(_.isInstanceOf[String])) 12
      else if (all(_.isInstanceOf[Int])) 13
      else if (all(x => x.isInstanceOf[Int] || x.isInstanceOf[Long])) 14
      else if (all(_.isInstanceOf[Double])) 15
      else if (all(_.isInstanceOf[Float])) 16
      else if (all(_.isInstanceOf[Boolean])) 17
      else if (all(_.isInstanceOf[java.sql.Timestamp])) 18
      else throw new IllegalArgumentException(
        s"mixed-type list feature value: ${xs.map(_.getClass.getSimpleName).distinct}")
    field match {
      case 11 => xs.foreach(x => body.bytesField(1, x.asInstanceOf[Array[Byte]]))
      case 12 => xs.foreach(x => body.stringField(1, x.asInstanceOf[String]))
      case 13 | 14 | 17 | 18 =>
        val p = new Writer
        xs.foreach {
          case i: Int => p.varintRaw(i.toLong)
          case l: Long => p.varintRaw(l)
          case b: Boolean => p.varintRaw(if (b) 1L else 0L)
          case t: java.sql.Timestamp => p.varintRaw(t.getTime / 1000L)
          case other => throw new IllegalArgumentException(s"mixed list element $other")
        }
        body.msgField(1, p)
      case 15 =>
        // packed doubles: 8 LE bytes per element, concatenated
        val pd = new java.io.ByteArrayOutputStream()
        xs.foreach { x =>
          val bits = java.lang.Double.doubleToRawLongBits(x.asInstanceOf[Double])
          var i = 0
          while (i < 8) { pd.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
        }
        body.bytesField(1, pd.toByteArray)
      case 16 =>
        val pf = new java.io.ByteArrayOutputStream()
        xs.foreach { x =>
          val bits = java.lang.Float.floatToRawIntBits(x.asInstanceOf[Float])
          var i = 0
          while (i < 4) { pf.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
        }
        body.bytesField(1, pf.toByteArray)
    }
    w.msgField(field, body)
  }

  /** proto Value message -> Scala value (null for the empty message). */
  def decodeValue(r: Reader): Any = {
    var out: Any = null
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      (field, wt) match {
        case (1, WtLen) => out = r.readLenBytes()
        case (2, WtLen) => out = r.readString()
        case (3, WtVarint) => out = r.readVarint().toInt
        case (4, WtVarint) => out = r.readVarint()
        case (5, WtI64) => out = java.lang.Double.longBitsToDouble(r.readI64())
        case (6, WtI32) => out = java.lang.Float.intBitsToFloat(r.readI32())
        case (7, WtVarint) => out = r.readVarint() != 0L
        case (8, WtVarint) => out = new java.sql.Timestamp(r.readVarint() * 1000L)
        case (11, WtLen) =>
          val b = r.readLenReader(); out = decodeRepeated(b)(_.readLenBytes())
        case (12, WtLen) =>
          val b = r.readLenReader(); out = decodeRepeated(b)(_.readString())
        case (13, WtLen) =>
          val b = r.readLenReader()
          out = decodePackedOrRepeated(b)(_.readVarint().toInt)
        case (14, WtLen) =>
          val b = r.readLenReader()
          out = decodePackedOrRepeated(b)(_.readVarint())
        case (15, WtLen) =>
          val b = r.readLenReader()
          out = decodePackedOrRepeated(b)(rr => java.lang.Double.longBitsToDouble(rr.readI64()))
        case (16, WtLen) =>
          val b = r.readLenReader()
          out = decodePackedOrRepeated(b)(rr => java.lang.Float.intBitsToFloat(rr.readI32()))
        case (17, WtLen) =>
          val b = r.readLenReader()
          out = decodePackedOrRepeated(b)(_.readVarint() != 0L)
        case (18, WtLen) =>
          val b = r.readLenReader()
          out = decodePackedOrRepeated(b)(rr => new java.sql.Timestamp(rr.readVarint() * 1000L))
        case (_, w0) => r.skip(w0)
      }
    }
    out
  }

  /** A *_list message of length-delimited elements (bytes/string —
    * never packed): {repeated val = 1}. */
  private def decodeRepeated[A](msg: Reader)(one: Reader => A): Seq[A] = {
    val buf = Vector.newBuilder[A]
    while (msg.hasNext) {
      val (f, wt) = msg.readTag()
      if (f == 1) buf += one(msg) else msg.skip(wt)
    }
    buf.result()
  }

  /** A numeric *_list message: packed (field 1, WtLen, concatenated
    * elements — the proto3 default) or unpacked (one element per tag).
    * The element reader's own width handling covers both varint and
    * fixed-size elements. */
  private def decodePackedOrRepeated[A](msg: Reader)(one: Reader => A): Seq[A] = {
    val buf = Vector.newBuilder[A]
    while (msg.hasNext) {
      val (f, wt) = msg.readTag()
      if (f == 1 && wt == WtLen) {
        val packed = msg.readLenReader()
        while (packed.hasNext) buf += one(packed)
      } else if (f == 1) buf += one(msg)
      else msg.skip(wt)
    }
    buf.result()
  }

  // ---- google.protobuf.Timestamp ----------------------------------

  /** `Timestamp{seconds=1}` (nanos unused across the serving surface).
    * ONE definition — the request codec and the reference-layout Redis
    * store both speak it, and byte-layout definitions must not exist
    * twice (review r7). */
  def encodeTimestamp(seconds: Long): Writer = {
    val w = new Writer
    if (seconds != 0) w.varintField(1, seconds)
    w
  }

  def decodeTimestampSeconds(r: Reader): Long = {
    var secs = 0L
    while (r.hasNext) {
      val (f, wt) = r.readTag()
      if (f == 1 && wt == WtVarint) secs = r.readVarint() else r.skip(wt)
    }
    secs
  }

  // ---- GetOnlineFeaturesRequestV2 ---------------------------------

  final case class EntityRowMsg(tsSeconds: Option[Long], fields: Seq[(String, Any)])
  final case class OnlineRequestMsg(
      features: Seq[(String, String)], // (feature_table, name)
      entityRows: Seq[EntityRowMsg],
      project: Option[String])

  def decodeOnlineRequest(bytes: Array[Byte]): OnlineRequestMsg = {
    val r = new Reader(bytes)
    val feats = Vector.newBuilder[(String, String)]
    val rows = Vector.newBuilder[EntityRowMsg]
    var project: Option[String] = None
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      (field, wt) match {
        case (4, WtLen) => // FeatureReferenceV2 {feature_table=1, name=2}
          val m = r.readLenReader()
          var table = ""; var name = ""
          while (m.hasNext) {
            val (f, w0) = m.readTag()
            if (f == 1 && w0 == WtLen) table = m.readString()
            else if (f == 2 && w0 == WtLen) name = m.readString()
            else m.skip(w0)
          }
          feats += ((table, name))
        case (2, WtLen) => // EntityRow {timestamp=1, fields map=2}
          val m = r.readLenReader()
          var ts: Option[Long] = None
          val kvs = Vector.newBuilder[(String, Any)]
          while (m.hasNext) {
            val (f, w0) = m.readTag()
            if (f == 1 && w0 == WtLen) { // google.protobuf.Timestamp
              ts = Some(decodeTimestampSeconds(m.readLenReader()))
            } else if (f == 2 && w0 == WtLen) { // map entry {key=1, value=2:Value}
              val e = m.readLenReader()
              var k = ""; var v: Any = null
              while (e.hasNext) {
                val (ef, ew) = e.readTag()
                if (ef == 1 && ew == WtLen) k = e.readString()
                else if (ef == 2 && ew == WtLen) v = decodeValue(e.readLenReader())
                else e.skip(ew)
              }
              kvs += ((k, v))
            } else m.skip(w0)
          }
          rows += EntityRowMsg(ts, kvs.result())
        case (5, WtLen) =>
          val p = r.readString()
          project = if (p.isEmpty) None else Some(p)
        case (_, w0) => r.skip(w0)
      }
    }
    OnlineRequestMsg(feats.result(), rows.result(), project)
  }

  // ---- GetOnlineFeaturesResponse ----------------------------------

  val StatusInvalid = 0
  val StatusPresent = 1
  val StatusNullValue = 2
  val StatusNotFound = 3
  val StatusOutsideMaxAge = 4

  def statusEnum(s: String): Int = s match {
    case graft.online.FeatureStatus.Present => StatusPresent
    case graft.online.FeatureStatus.NotFound => StatusNotFound
    case graft.online.FeatureStatus.OutsideMaxAge => StatusOutsideMaxAge
    case "NULL_VALUE" => StatusNullValue
    case _ => StatusInvalid
  }

  /** One FieldValues message per entity row, row-major: `rows(i)` is
    * (name -> value, name -> status enum) for row i. */
  def encodeOnlineResponse(rows: Seq[(Seq[(String, Any)], Seq[(String, Int)])]): Array[Byte] = {
    val w = new Writer
    rows.foreach { case (values, statuses) =>
      val fv = new Writer
      values.foreach { case (name, v) =>
        val entry = new Writer
        entry.stringField(1, name)
        entry.msgField(2, encodeValue(v))
        fv.msgField(1, entry)
      }
      statuses.foreach { case (name, st) =>
        val entry = new Writer
        entry.stringField(1, name)
        if (st != 0) entry.varintField(2, st.toLong)
        fv.msgField(2, entry)
      }
      w.msgField(1, fv)
    }
    w.toBytes
  }

  /** Decode the response (the client/test side of the same wire). */
  def decodeOnlineResponse(bytes: Array[Byte]): Seq[(Map[String, Any], Map[String, Int])] = {
    val r = new Reader(bytes)
    val out = Vector.newBuilder[(Map[String, Any], Map[String, Int])]
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      if (field == 1 && wt == WtLen) {
        val fv = r.readLenReader()
        val values = Map.newBuilder[String, Any]
        val statuses = Map.newBuilder[String, Int]
        while (fv.hasNext) {
          val (f, w0) = fv.readTag()
          if (f == 1 && w0 == WtLen) {
            val e = fv.readLenReader()
            var k = ""; var v: Any = null
            while (e.hasNext) {
              val (ef, ew) = e.readTag()
              if (ef == 1 && ew == WtLen) k = e.readString()
              else if (ef == 2 && ew == WtLen) v = decodeValue(e.readLenReader())
              else e.skip(ew)
            }
            values += ((k, v))
          } else if (f == 2 && w0 == WtLen) {
            val e = fv.readLenReader()
            var k = ""; var st = 0
            while (e.hasNext) {
              val (ef, ew) = e.readTag()
              if (ef == 1 && ew == WtLen) k = e.readString()
              else if (ef == 2 && ew == WtVarint) st = e.readVarint().toInt
              else e.skip(ew)
            }
            statuses += ((k, st))
          } else fv.skip(w0)
        }
        out += ((values.result(), statuses.result()))
      } else r.skip(wt)
    }
    out.result()
  }

  // ---- GetFeastServingInfo ----------------------------------------

  def encodeServingInfo(version: String): Array[Byte] = {
    val w = new Writer
    w.stringField(1, version)
    w.varintField(2, 1L) // FEAST_SERVING_TYPE_ONLINE
    w.toBytes
  }

  /** (version, serving type enum) — the CLIENT side of
    * GetFeastServingInfo. */
  def decodeServingInfo(bytes: Array[Byte]): (String, Int) = {
    val r = new Reader(bytes)
    var version = ""
    var tpe = 0
    while (r.hasNext) {
      r.readTag() match {
        case (1, 2) => version = r.readString()
        case (2, 0) => tpe = r.readVarint().toInt
        case (_, wt) => r.skip(wt)
      }
    }
    (version, tpe)
  }

  /** Encode a request (the CLIENT side — used by the spec to drive the
    * server over the real wire). */
  def encodeOnlineRequest(req: OnlineRequestMsg): Array[Byte] = {
    val w = new Writer
    req.entityRows.foreach { row =>
      val m = new Writer
      row.tsSeconds.foreach(s => m.msgField(1, encodeTimestamp(s)))
      row.fields.foreach { case (k, v) =>
        val e = new Writer
        e.stringField(1, k)
        e.msgField(2, encodeValue(v))
        m.msgField(2, e)
      }
      w.msgField(2, m)
    }
    req.features.foreach { case (table, name) =>
      val m = new Writer
      m.stringField(1, table)
      m.stringField(2, name)
      w.msgField(4, m)
    }
    req.project.foreach(p => w.stringField(5, p))
    w.toBytes
  }
}
