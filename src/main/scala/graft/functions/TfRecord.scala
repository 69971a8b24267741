package graft.functions

import java.io.{DataOutputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.serving.ProtoWire

/** TFRecord + `tf.train.Example` export and read-back — the standard
  * training-data interchange format (t5 / tfds / tfx pipelines consume
  * TFRecord shards), hand-rolled from the PUBLIC specs because the
  * environment has neither tensorflow nor protobuf-java:
  *
  *  - TFRecord framing (tensorflow/core/lib/io/record_writer.h):
  *    `[length: u64 LE][masked crc32c(length bytes): u32 LE]
  *     [data][masked crc32c(data): u32 LE]`, where
  *    `mask(crc) = rotr(crc, 15) + 0xa282ead8` on uint32 and crc32c is
  *    the Castagnoli polynomial (JDK `java.util.zip.CRC32C`).
  *  - `tf.train.Example` (tensorflow/core/example/{example,feature}
  *    .proto): Example{features=1}; Features{feature=1: map<string,
  *    Feature>}; Feature oneof bytes_list=1 / float_list=2 /
  *    int64_list=3; BytesList value=1 (len-delimited), FloatList
  *    value=1 (packed fixed32), Int64List value=1 (packed varint) —
  *    encoded with the same [[ProtoWire]] writer the serving codecs
  *    use.
  *
  * Type mapping (the tf.Example universe is bytes/float32/int64):
  * string→BytesList(utf8), binary→BytesList, byte/short/int/long→
  * Int64List, boolean→Int64List(0/1), timestamp→Int64List epoch
  * MICROS, date→Int64List epoch days, float→FloatList, double→
  * FloatList (NARROWED to float32 — tf.Example has no double list;
  * callers needing exact doubles export the bit pattern as int64
  * themselves), arrays of those→the multi-valued list. A NULL field
  * omits the feature from the Example (the standard sparse
  * convention); the reader yields null for a missing feature.
  *
  * Scale shape: [[writeShards]] is one narrow exchange
  * (`repartition(n)`) then a per-partition streaming write — shard
  * count = file count = the read parallelism every TFRecord consumer
  * expects; no driver materialization. [[readShards]] maps one shard
  * file to one input row (`binaryFile`) and decodes records in a
  * streaming pass — a shard is the split unit, exactly how TF data
  * pipelines parallelize.
  */
object TfRecord {

  /** TFRecord's masked crc32c (record_writer.h). */
  private[graft] def maskedCrc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    Integer.rotateRight(crc, 15) + 0xa282ead8
  }
  private[graft] def maskedCrc32c(bytes: Array[Byte]): Int =
    maskedCrc32c(bytes, 0, bytes.length)

  /** One framed record: `[len u64le][maskedCrc(len) u32le][data]
    * [maskedCrc(data) u32le]`. */
  private[graft] def frame(data: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + 4 + data.length + 4).order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(data.length.toLong)
    val lenBytes = new Array[Byte](8)
    out.position(0); out.get(lenBytes); out.position(8)
    out.putInt(maskedCrc32c(lenBytes))
    out.put(data)
    out.putInt(maskedCrc32c(data))
    out.array()
  }

  // ---- tf.train.Example encoding -----------------------------------

  private def bytesList(vs: Seq[Array[Byte]]): ProtoWire.Writer = {
    val w = new ProtoWire.Writer()
    vs.foreach(w.bytesField(1, _))
    w
  }
  private def int64List(vs: Seq[Long]): ProtoWire.Writer = {
    val w = new ProtoWire.Writer()
    val packed = new ProtoWire.Writer()
    vs.foreach(packed.varintRaw)
    w.bytesField(1, packed.toBytes) // packed varints ride a LEN field
    w
  }
  private def floatList(vs: Seq[Float]): ProtoWire.Writer = {
    val w = new ProtoWire.Writer()
    val packed = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(packed.putFloat)
    w.bytesField(1, packed.array())
    w
  }

  /** Feature oneof for one Spark value; None for null (feature omitted).
    * tf.Example lists cannot represent element nulls, so a null array
    * ELEMENT is rejected loudly (naming the field) instead of NPE-ing
    * inside the encoder. */
  private def featureOf(name: String, dt: DataType, v: Any): Option[ProtoWire.Writer] = {
    if (v == null) return None
    def seqOf(v: Any): Seq[Any] = {
      val s = TfRecord.seqOf(v)
      if (s.exists(_ == null)) throw new IllegalArgumentException(
        s"feature '$name': tf.Example lists cannot hold null elements")
      s
    }
    def one(elem: DataType, x: Any): ProtoWire.Writer = elem match {
      case StringType => wrap(1, bytesList(Seq(x.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))))
      case BinaryType => wrap(1, bytesList(Seq(x.asInstanceOf[Array[Byte]])))
      case LongType => wrap(3, int64List(Seq(x.asInstanceOf[Long])))
      case IntegerType => wrap(3, int64List(Seq(x.asInstanceOf[Int].toLong)))
      case ShortType => wrap(3, int64List(Seq(x.asInstanceOf[Short].toLong)))
      case ByteType => wrap(3, int64List(Seq(x.asInstanceOf[Byte].toLong)))
      case BooleanType => wrap(3, int64List(Seq(if (x.asInstanceOf[Boolean]) 1L else 0L)))
      // match on the VALUE, not a cast: sessions with
      // spark.sql.datetime.java8API.enabled=true carry
      // java.time.Instant/LocalDate in external rows, and the old
      // asInstanceOf crashed every timestamped export with an opaque
      // executor ClassCastException (review r12)
      case TimestampType => wrap(3, int64List(Seq(tsMicros(name, x))))
      case DateType => wrap(3, int64List(Seq(epochDays(name, x))))
      case FloatType => wrap(2, floatList(Seq(x.asInstanceOf[Float])))
      case DoubleType => wrap(2, floatList(Seq(x.asInstanceOf[Double].toFloat)))
      case other => throw new IllegalArgumentException(
        s"unsupported tf.Example type $other")
    }
    Some(dt match {
      case ArrayType(StringType, _) =>
        wrap(1, bytesList(seqOf(v).map(s =>
          s.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))))
      case ArrayType(BinaryType, _) =>
        wrap(1, bytesList(seqOf(v).map(_.asInstanceOf[Array[Byte]])))
      case ArrayType(LongType, _) =>
        wrap(3, int64List(seqOf(v).map(_.asInstanceOf[Long])))
      case ArrayType(IntegerType, _) =>
        wrap(3, int64List(seqOf(v).map(_.asInstanceOf[Int].toLong)))
      case ArrayType(FloatType, _) =>
        wrap(2, floatList(seqOf(v).map(_.asInstanceOf[Float])))
      case ArrayType(DoubleType, _) =>
        wrap(2, floatList(seqOf(v).map(_.asInstanceOf[Double].toFloat)))
      // the remaining documented int64-kind scalars in list form — the
      // scaladoc promised these and the fall-through threw (review r12)
      case ArrayType(ShortType, _) =>
        wrap(3, int64List(seqOf(v).map(_.asInstanceOf[Short].toLong)))
      case ArrayType(ByteType, _) =>
        wrap(3, int64List(seqOf(v).map(_.asInstanceOf[Byte].toLong)))
      case ArrayType(BooleanType, _) =>
        wrap(3, int64List(seqOf(v).map(b => if (b.asInstanceOf[Boolean]) 1L else 0L)))
      case ArrayType(TimestampType, _) =>
        wrap(3, int64List(seqOf(v).map(x => tsMicros(name, x))))
      case ArrayType(DateType, _) =>
        wrap(3, int64List(seqOf(v).map(x => epochDays(name, x))))
      case scalar => one(scalar, v)
    })
  }

  /** Timestamp value → epoch micros, accepting both external forms
    * (java.sql.Timestamp, and java.time.Instant under
    * spark.sql.datetime.java8API.enabled). */
  private def tsMicros(name: String, x: Any): Long = x match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case i: java.time.Instant =>
      java.lang.Math.addExact(
        java.lang.Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    case other => throw new IllegalArgumentException(
      s"feature '$name': unsupported timestamp value ${other.getClass}")
  }

  /** Date value → epoch days (java.sql.Date or java.time.LocalDate). */
  private def epochDays(name: String, x: Any): Long = x match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case l: java.time.LocalDate => l.toEpochDay
    case other => throw new IllegalArgumentException(
      s"feature '$name': unsupported date value ${other.getClass}")
  }

  /** Feature{<field>=list} — the oneof wrapper. */
  private def wrap(field: Int, list: ProtoWire.Writer): ProtoWire.Writer = {
    val w = new ProtoWire.Writer()
    w.msgField(field, list)
    w
  }

  private def seqOf(v: Any): Seq[Any] = v match {
    case s: scala.collection.Seq[_] => s.toSeq
    case a: Array[_] => a.toSeq
    case other => throw new IllegalArgumentException(
      s"array column holds ${other.getClass}")
  }

  /** Row → serialized tf.train.Example. */
  private[graft] def encodeExample(schema: StructType, row: Row): Array[Byte] = {
    val features = new ProtoWire.Writer()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      featureOf(f.name, f.dataType, if (row.isNullAt(i)) null else row.get(i)).foreach { feat =>
        val entry = new ProtoWire.Writer()
        entry.stringField(1, f.name)
        entry.msgField(2, feat)
        features.msgField(1, entry) // map<string, Feature> entry
      }
    }
    val example = new ProtoWire.Writer()
    example.msgField(1, features)
    example.toBytes
  }

  /** Serialized Example → values aligned to `schema` (missing feature
    * → null). */
  private[graft] def decodeExample(schema: StructType, bytes: Array[Byte]): Row = {
    // feature name -> (oneof field, list payload reader)
    val feats = scala.collection.mutable.Map.empty[String, (Int, Array[Byte])]
    val ex = new ProtoWire.Reader(bytes)
    while (ex.hasNext) {
      val (f, wt) = ex.readTag()
      if (f == 1 && wt == ProtoWire.WtLen) {
        val fs = ex.readLenReader()
        while (fs.hasNext) {
          val (ff, fwt) = fs.readTag()
          if (ff == 1 && fwt == ProtoWire.WtLen) {
            val entry = fs.readLenReader()
            var name: String = null
            var kind = 0
            var payload = Array.emptyByteArray
            while (entry.hasNext) {
              val (ef, ewt) = entry.readTag()
              if (ef == 1 && ewt == ProtoWire.WtLen) name = entry.readString()
              else if (ef == 2 && ewt == ProtoWire.WtLen) {
                val feat = entry.readLenReader()
                while (feat.hasNext) {
                  val (lf, lwt) = feat.readTag()
                  if (lwt == ProtoWire.WtLen && lf >= 1 && lf <= 3) {
                    kind = lf; payload = feat.readLenBytes()
                  } else feat.skip(lwt)
                }
              } else entry.skip(ewt)
            }
            if (name != null) feats(name) = (kind, payload)
          } else fs.skip(fwt)
        }
      } else ex.skip(wt)
    }

    def bytesValues(payload: Array[Byte]): Seq[Array[Byte]] = {
      val r = new ProtoWire.Reader(payload)
      val out = Seq.newBuilder[Array[Byte]]
      while (r.hasNext) {
        val (f, wt) = r.readTag()
        if (f == 1 && wt == ProtoWire.WtLen) out += r.readLenBytes() else r.skip(wt)
      }
      out.result()
    }
    def int64Values(payload: Array[Byte]): Seq[Long] = {
      val r = new ProtoWire.Reader(payload)
      val out = Seq.newBuilder[Long]
      while (r.hasNext) {
        val (f, wt) = r.readTag()
        if (f == 1 && wt == ProtoWire.WtLen) { // packed
          val p = r.readLenReader()
          while (p.hasNext) out += p.readVarint()
        } else if (f == 1 && wt == ProtoWire.WtVarint) out += r.readVarint()
        else r.skip(wt)
      }
      out.result()
    }
    def floatValues(payload: Array[Byte]): Seq[Float] = {
      val r = new ProtoWire.Reader(payload)
      val out = Seq.newBuilder[Float]
      while (r.hasNext) {
        val (f, wt) = r.readTag()
        if (f == 1 && wt == ProtoWire.WtLen) { // packed
          val b = r.readLenBytes()
          val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
          while (bb.remaining() >= 4) out += bb.getFloat
        } else if (f == 1 && wt == ProtoWire.WtI32) out += java.lang.Float.intBitsToFloat(r.readI32())
        else r.skip(wt)
      }
      out.result()
    }

    // a SCALAR schema against a multi-valued stored list is a loud
    // mismatch, not a silent head-truncation (review r12) — consistent
    // with the list-kind mismatch throw below
    def single[A](name: String, xs: Seq[A]): Option[A] = {
      if (xs.size > 1) throw new IllegalArgumentException(
        s"feature '$name': stored list holds ${xs.size} values but the " +
          "schema declares a scalar — read it as an array type")
      xs.headOption
    }
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val values = schema.fields.map { f =>
      feats.get(f.name) match {
        case None => null
        case Some((kind, payload)) => (f.dataType, kind) match {
          case (StringType, 1) => single(f.name, bytesValues(payload))
            .map(new String(_, StandardCharsets.UTF_8)).orNull
          case (BinaryType, 1) => single(f.name, bytesValues(payload)).orNull
          case (LongType, 3) => single(f.name, int64Values(payload)).map(Long.box).orNull
          case (IntegerType, 3) => single(f.name, int64Values(payload)).map(l => Int.box(l.toInt)).orNull
          case (ShortType, 3) => single(f.name, int64Values(payload)).map(l => Short.box(l.toShort)).orNull
          case (ByteType, 3) => single(f.name, int64Values(payload)).map(l => Byte.box(l.toByte)).orNull
          case (BooleanType, 3) => single(f.name, int64Values(payload)).map(l => Boolean.box(l != 0L)).orNull
          case (TimestampType, 3) => single(f.name, int64Values(payload)).map(tsOf).orNull
          case (DateType, 3) => single(f.name, int64Values(payload))
            .map(d => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d))).orNull
          case (FloatType, 2) => single(f.name, floatValues(payload)).map(Float.box).orNull
          case (DoubleType, 2) => single(f.name, floatValues(payload)).map(f0 => Double.box(f0.toDouble)).orNull
          case (ArrayType(StringType, _), 1) =>
            bytesValues(payload).map(new String(_, StandardCharsets.UTF_8))
          case (ArrayType(BinaryType, _), 1) => bytesValues(payload)
          case (ArrayType(LongType, _), 3) => int64Values(payload)
          case (ArrayType(IntegerType, _), 3) => int64Values(payload).map(_.toInt)
          // list forms of the remaining int64-kind scalars (write-side
          // parity, review r12)
          case (ArrayType(ShortType, _), 3) => int64Values(payload).map(_.toShort)
          case (ArrayType(ByteType, _), 3) => int64Values(payload).map(_.toByte)
          case (ArrayType(BooleanType, _), 3) => int64Values(payload).map(_ != 0L)
          case (ArrayType(TimestampType, _), 3) => int64Values(payload).map(tsOf)
          case (ArrayType(DateType, _), 3) => int64Values(payload)
            .map(d => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)))
          case (ArrayType(FloatType, _), 2) => floatValues(payload)
          case (ArrayType(DoubleType, _), 2) => floatValues(payload).map(_.toDouble)
          case (dt, k) => throw new IllegalArgumentException(
            s"feature '${f.name}': schema $dt does not match stored list kind $k")
        }
      }
    }
    Row.fromSeq(values.toIndexedSeq)
  }

  // ---- shard write / read ------------------------------------------

  /** Export `df` as `numShards` TFRecord shard files
    * (`part-NNNNN.tfrecord`) under `outDir`, one file per partition,
    * written task-side (no driver materialization) and committed by a
    * tmp-write + rename per shard, `_SUCCESS` at the end. Retried
    * tasks re-write the same deterministic content (round-robin
    * repartition sorts locally for retry stability), so a
    * last-rename-wins overwrite is benign. */
  def writeShards(df: DataFrame, outDir: String, numShards: Int): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val schema = df.schema
    // hadoop conf entries ride a plain Map (SerializableConfiguration
    // is private[spark]); file-scheme defaults need nothing, cluster
    // fs settings (fs.defaultFS etc.) re-apply task-side
    val confMap: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      df.sparkSession.sparkContext.hadoopConfiguration.asScala
        .map(e => e.getKey -> e.getValue).toMap
    }
    val dir = outDir
    df.repartition(numShards).foreachPartition { (rows: Iterator[Row]) =>
      val conf = new Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val fs = new Path(dir).getFileSystem(conf)
      val dest = new Path(dir, f"part-$pid%05d.tfrecord")
      val tmp = new Path(dir, f".part-$pid%05d.tfrecord.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16))
      try {
        rows.foreach { r => out.write(frame(encodeExample(schema, r))) }
        out.close()
        if (fs.exists(dest)) fs.delete(dest, false)
        if (!fs.rename(tmp, dest))
          throw new java.io.IOException(s"rename $tmp -> $dest failed")
      } finally {
        try out.close() catch { case _: Throwable => () }
        if (fs.exists(tmp)) fs.delete(tmp, false)
        ()
      }
    }
    val fs = new Path(outDir).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.create(new Path(outDir, "_SUCCESS"), true).close()
  }

  /** Parse one shard's bytes into Examples, verifying both crcs per
    * record (a torn/corrupt shard fails loudly, never yields partial
    * garbage). */
  private[graft] def parseShard(bytes: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var pos = 0
      override def hasNext: Boolean = pos < bytes.length
      override def next(): Array[Byte] = {
        if (pos + 12 > bytes.length) throw new EOFException(s"torn record header at $pos")
        val bb = ByteBuffer.wrap(bytes, pos, 12).order(ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong
        val lenCrc = bb.getInt
        require(maskedCrc32c(bytes, pos, 8) == lenCrc, s"length crc mismatch at $pos")
        require(len >= 0 && len <= Int.MaxValue.toLong && pos + 12 + len + 4 <= bytes.length,
          s"record length $len overruns shard at $pos")
        val data = java.util.Arrays.copyOfRange(bytes, pos + 12, pos + 12 + len.toInt)
        val dataCrc = ByteBuffer.wrap(bytes, pos + 12 + len.toInt, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        require(maskedCrc32c(data) == dataCrc, s"data crc mismatch at $pos")
        pos += 12 + len.toInt + 4
        data
      }
    }

  /** Read TFRecord shards back as a DataFrame with `schema` (field
    * order = output column order; missing features → null). One shard
    * file = one input split, decoded in a streaming pass. */
  def readShards(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord")
      .load(dir)
      .select(col("content"))
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        parseShard(bytes).map(decodeExample(schema, _))
      }(enc)
  }
}
