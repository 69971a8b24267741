package graft.functions

import java.io.DataOutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** WebDataset export + read-back: POSIX-ustar tar shards whose members
  * are named `<sample key>.<part suffix>`, adjacent members of one key
  * forming one sample — the de-facto interchange format of multimodal
  * training pipelines (image/audio–text pairs stream as tar shards so
  * sequential reads stay sequential at the object store). Hand-rolled
  * from the public ustar layout (POSIX.1-1988 / pax interchange
  * header): 512-byte header (name 100, mode/uid/gid octal, size 12
  * octal, mtime 12, chksum computed with the field spaced out,
  * typeflag '0', magic "ustar\0" "00"), data padded to 512, two zero
  * blocks as the trailer. Headers are written fully deterministic
  * (mtime 0, uid/gid 0, mode 0644) so identical input bytes produce
  * identical shard bytes.
  *
  * Scale shape mirrors [[TfRecord]]: write = one narrow exchange +
  * per-partition streaming tar (tmp+rename commit, `_SUCCESS`); read =
  * one shard file per split (`binaryFile`), parsed in one pass with
  * checksum verification per header, samples grouped by ADJACENCY (the
  * WebDataset contract — members of a sample are consecutive).
  *
  * Part columns must be string (written utf8) or binary (written raw);
  * a NULL part is omitted from the sample and reads back null.
  */
object WebDataset {

  private val BlockSize = 512

  // ---- tar member encoding -------------------------------------------

  /** One ustar member: header block + data padded to 512. */
  private[graft] def tarMember(name: String, data: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100, s"tar member name over 100 bytes: $name")
    val header = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, header, off, b.length)
    }
    System.arraycopy(nameBytes, 0, header, 0, nameBytes.length)
    put(100, "0000644\u0000")                       // mode
    put(108, "0000000\u0000")                       // uid
    put(116, "0000000\u0000")                       // gid
    put(124, f"${data.length}%011o\u0000")          // size
    put(136, "00000000000\u0000")                   // mtime 0: deterministic bytes
    java.util.Arrays.fill(header, 148, 156, ' '.toByte) // chksum spaced for the sum
    header(156) = '0'                               // typeflag: regular file
    put(257, "ustar\u0000")                         // magic
    put(263, "00")                                  // version
    var sum = 0
    var i = 0
    while (i < BlockSize) { sum += header(i) & 0xff; i += 1 }
    put(148, f"$sum%06o\u0000 ")                    // 6 octal + NUL + space
    val padded = (data.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    System.arraycopy(header, 0, out, 0, BlockSize)
    System.arraycopy(data, 0, out, BlockSize, data.length)
    out
  }

  private[graft] val Trailer = new Array[Byte](2 * BlockSize)

  /** Parse a tar shard: (member name, bytes) in file order, header
    * checksums verified, stops at the zero trailer. */
  private[graft] def parseTar(bytes: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var pos = 0
      // a shard SHORTER than one block at the cursor is torn, not ended:
      // folding it into the trailer test made the torn-header require
      // unreachable and a truncated shard read back as a clean archive
      // with silently missing samples (review r12)
      private def atTrailer: Boolean = {
        if (pos >= bytes.length)
          throw new IllegalArgumentException(
            s"torn tar shard: ended at $pos without a zero trailer")
        if (pos + BlockSize > bytes.length)
          throw new IllegalArgumentException(s"torn tar header at $pos")
        (0 until BlockSize).forall(i => bytes(pos + i) == 0)
      }
      override def hasNext: Boolean = !atTrailer
      override def next(): (String, Array[Byte]) = {
        require(pos + BlockSize <= bytes.length, s"torn tar header at $pos")
        var nameEnd = pos
        while (nameEnd < pos + 100 && bytes(nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, pos, nameEnd - pos, StandardCharsets.UTF_8)
        def octal(off: Int, len: Int): Long = {
          var v = 0L
          var i = pos + off
          val end = pos + off + len
          // POSIX permits LEADING spaces/NULs in numeric fields (BSD and
          // older GNU tar pad left) — skip them, then parse to the first
          // terminator; stopping at a leading space read the field as 0
          // and failed the checksum on valid foreign archives (review r12)
          while (i < end && (bytes(i) == ' ' || bytes(i) == 0)) i += 1
          while (i < end && bytes(i) != 0 && bytes(i) != ' ') {
            v = v * 8 + (bytes(i) - '0'); i += 1
          }
          v
        }
        // verify the header checksum (chksum field counted as spaces)
        var sum = 0L
        var i = 0
        while (i < BlockSize) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xff)
          i += 1
        }
        require(sum == octal(148, 8), s"tar header checksum mismatch at $pos ($name)")
        val size = octal(124, 12)
        require(size >= 0 && size <= Int.MaxValue.toLong &&
          pos + BlockSize + size <= bytes.length, s"member '$name' overruns shard")
        val data = java.util.Arrays.copyOfRange(
          bytes, pos + BlockSize, pos + BlockSize + size.toInt)
        val padded = (size.toInt + BlockSize - 1) / BlockSize * BlockSize
        pos += BlockSize + padded
        (name, data)
      }
    }

  // ---- shard write / read ---------------------------------------------

  /** Export one sample per row: member `<keyCol value>.<suffix>` holds
    * the named column's bytes (string→utf8, binary→raw; null part
    * omitted). `numShards` tar files under `outDir`. */
  def writeShards(df: DataFrame, outDir: String, numShards: Int,
      keyCol: String, parts: Seq[(String, String)]): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(parts.nonEmpty, "need at least one (suffix, column) part")
    val schema = df.schema
    parts.foreach { case (_, c) =>
      val dt = schema(c).dataType
      require(dt == StringType || dt == BinaryType,
        s"part column '$c' must be string or binary, got $dt")
    }
    val keyIdx = schema.fieldIndex(keyCol)
    val partIdx = parts.map { case (sfx, c) => (sfx, schema.fieldIndex(c)) }
    val sfxBytes: Map[String, Int] =
      parts.map(p => p._1 -> p._1.getBytes(StandardCharsets.UTF_8).length).toMap
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
      val dest = new Path(dir, f"shard-$pid%05d.tar")
      val tmp = new Path(dir, f".shard-$pid%05d.tar.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16))
      // WebDataset keys must be UNIQUE per shard: the read-side
      // adjacency grouping merges same-key members into one sample
      // (dropping all but the last duplicate part) — silent row loss on
      // round-trip for any per-entity multi-row source (review r12).
      // O(rows/shard) key strings of tracking, bounded by shard size.
      val seenKeys = new java.util.HashSet[String]()
      try {
        rows.foreach { r =>
          require(!r.isNullAt(keyIdx), s"null sample key '$keyCol'")
          val key = r.get(keyIdx).toString
          require(seenKeys.add(key),
            s"duplicate sample key '$key' in shard $pid: WebDataset keys " +
              "must be unique per shard (the reader's adjacency grouping " +
              "would merge the rows) — aggregate to one row per key or " +
              "export a unique row id as the key")
          // The read-side grouping rule splits at the FIRST dot past the
          // last slash, so a dotted key ('user.1' → member 'user.1.json')
          // would read back as key 'user' / part '1.json' — silently
          // corrupted. Fail fast at write time instead; same for the
          // ustar 100-byte name limit — checked against the longest
          // suffix this ROW actually writes (a null part emits no
          // member, so its suffix must not veto the row).
          require(key.indexOf('.', key.lastIndexOf('/') + 1) < 0,
            s"sample key '$key' contains '.' past its last '/': WebDataset " +
              "keys must be dot-free (the first dot delimits the part suffix)")
          val rowMaxSfx = partIdx.collect {
            case (sfx, i) if !r.isNullAt(i) => sfxBytes(sfx)
          }.maxOption
          // all-null row: no member is written, so no name exists to
          // exceed the limit — the key-length check must not veto it
          rowMaxSfx.foreach { sfx =>
            require(key.getBytes(StandardCharsets.UTF_8).length + 1 + sfx <= 100,
              s"sample key '$key' + its longest non-null part suffix exceeds " +
                "the ustar 100-byte member-name limit")
          }
          partIdx.foreach { case (sfx, i) =>
            if (!r.isNullAt(i)) {
              val data = r.get(i) match {
                case s: String => s.getBytes(StandardCharsets.UTF_8)
                case b: Array[Byte] => b
                case other => throw new IllegalArgumentException(
                  s"part value of ${other.getClass}")
              }
              out.write(tarMember(s"$key.$sfx", data))
            }
          }
        }
        out.write(Trailer)
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

  /** Read WebDataset shards back: one row per sample — `key` string
    * plus one STRING column per part suffix (utf8-decoded; callers
    * with raw-binary parts read via [[readShardsBinary]]). Samples
    * group by adjacency within a shard, the WebDataset contract. */
  def readShards(spark: SparkSession, dir: String,
      suffixes: Seq[String]): DataFrame = {
    val schema = StructType(StructField("key", StringType) +:
      suffixes.map(s => StructField(s, StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val sfx = suffixes
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(col("content"))
      .flatMap { r =>
        groupSamples(parseTar(r.getAs[Array[Byte]](0))).map { case (key, members) =>
          Row.fromSeq(key +: sfx.map(s =>
            members.get(s).map(new String(_, StandardCharsets.UTF_8)).orNull))
        }
      }(enc)
  }

  /** [[readShards]] with raw binary part columns. */
  def readShardsBinary(spark: SparkSession, dir: String,
      suffixes: Seq[String]): DataFrame = {
    val schema = StructType(StructField("key", StringType) +:
      suffixes.map(s => StructField(s, BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val sfx = suffixes
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(col("content"))
      .flatMap { r =>
        groupSamples(parseTar(r.getAs[Array[Byte]](0))).map { case (key, members) =>
          Row.fromSeq(key +: sfx.map(s => members.get(s).orNull))
        }
      }(enc)
  }

  /** Adjacent members sharing a key prefix = one sample. The suffix is
    * everything past the FIRST dot of the basename (WebDataset's rule:
    * `a/b/c.x.y` → key `a/b/c`, part `x.y`). */
  private[graft] def groupSamples(
      members: Iterator[(String, Array[Byte])]): Iterator[(String, Map[String, Array[Byte]])] =
    new Iterator[(String, Map[String, Array[Byte]])] {
      private var pending: Option[(String, Array[Byte])] = None
      private def keyOf(name: String): (String, String) = {
        val slash = name.lastIndexOf('/')
        val dot = name.indexOf('.', slash + 1)
        require(dot > slash, s"member '$name' has no part suffix")
        (name.substring(0, dot), name.substring(dot + 1))
      }
      override def hasNext: Boolean = pending.nonEmpty || members.hasNext
      override def next(): (String, Map[String, Array[Byte]]) = {
        val first = pending.getOrElse(members.next())
        pending = None
        val (key, sfx0) = keyOf(first._1)
        var parts = Map(sfx0 -> first._2)
        var done = false
        while (!done && members.hasNext) {
          val m = members.next()
          val (k, sfx) = keyOf(m._1)
          if (k == key) parts += (sfx -> m._2)
          else { pending = Some(m); done = true }
        }
        (key, parts)
      }
    }
}
