package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs as batched partition-level functions.
  *
  * The actual codecs are NOT available in this environment, so the
  * decode step is STUBBED with a deterministic fake
  * (`StubImageDecoder`) — the Spark-side plumbing (schema, batching,
  * partition sizing) is real and tested; swap the decoder for a JNI/
  * library-backed one in production.
  */
object Multimodal {

  /** Metadata schema carried alongside every binary payload. */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("size_bytes", LongType),
    StructField("format", StringType),
    StructField("checksum", StringType)))

  /** Cheap per-row metadata extraction (pure columns, codegen'd):
    * size, magic-byte format sniffing, md5 checksum. */
  def metadataOf(bin: Column): Column = struct(
    octet_length(bin).cast("long").as("size_bytes"),
    sniffFormat(bin).as("format"),
    md5(bin).as("checksum"))

  /** Magic-byte format detection over the binary prefix. */
  def sniffFormat(bin: Column): Column =
    when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 8)) === "89504E470D0A1A0A", "png")
      .when(substring(bin, 1, 4).cast("string") === "RIFF", "riff")
      .otherwise("unknown")

  /** Deterministic fake image decode — STUB standing in for a real
    * codec: dimensions derived from payload size so oracles can verify
    * the plumbing end-to-end. */
  def stubDecodeImage(bin: Column): Column = {
    val n = octet_length(bin).cast("long")
    struct(
      (pmod(n, lit(640L)) + 16L).as("width"),
      (pmod(n * 7L, lit(480L)) + 16L).as("height"),
      lit(3).as("channels"))
  }

  /** Deterministic resize STUB (the image-resize integration point —
    * no codec libs in this container): computes the fit-within-box
    * output geometry (aspect-preserving, never upscaling) and the
    * resulting byte estimate from the stub-decoded dimensions. The
    * arithmetic is pure integer/double columns, so the plumbing is
    * value-verifiable end-to-end; a production build swaps the payload
    * transform, keeping this exact column contract. */
  def stubResize(decoded: Column, boxW: Int, boxH: Int): Column = {
    val w = decoded.getField("width").cast("double")
    val h = decoded.getField("height").cast("double")
    val scale = least(lit(boxW.toDouble) / w, lit(boxH.toDouble) / h, lit(1.0))
    val outW = floor(w * scale).cast("long")
    val outH = floor(h * scale).cast("long")
    struct(outW.as("width"), outH.as("height"),
      (outW * outH * decoded.getField("channels").cast("long")).as("size_bytes"))
  }

  /** Evenly sample `n` fixed-width byte frames from a payload (the
    * video frame-sample shape; deterministic). */
  def sampleFrames(bin: Column, n: Int, frameBytes: Int): Column = {
    val len = octet_length(bin)
    transform(sequence(lit(0), lit(n - 1)), i =>
      substring(bin, (i * greatest((len - frameBytes) / lit(math.max(n - 1, 1)), lit(0)) + 1)
        .cast("int"), lit(frameBytes)))
  }

  /** Perceptual average-hash (aHash) over the deterministic stub
    * downscale — the image near-dup fingerprint: real pipelines decode
    * → downscale to an 8×8 grayscale tile → threshold each cell by the
    * tile mean → 64-bit hash; hamming distance between hashes is the
    * near-dup signal. With codecs unavailable, the "tile" is 64 evenly
    * spaced payload bytes (the same deterministic sampling as
    * [[sampleFrames]]) — the thresholding, packing, and downstream
    * banding are the real algorithm. Thresholding is pure integer
    * arithmetic (64·pixel > sum, never a float mean), and the hash is
    * emitted as a 64-char bit string, so the oracle replays it
    * bit-for-bit. Near-dup pairing reuses the SimHash band machinery
    * (split the 64 bits into bands, bucket-join on band equality).
    * Caller must filter empty payloads. */
  def stubAverageHash(bin: Column): Column = {
    val len = octet_length(bin)
    val pixels = transform(sequence(lit(0), lit(63)), k => {
      val pos = (floor(k.cast("double") * (len - 1).cast("double") / lit(63.0)) + 1).cast("int")
      conv(hex(bin.substr(pos, lit(1))), 16, 10).cast("long")
    })
    val total = aggregate(pixels, lit(0L), (acc, p) => acc + p)
    concat_ws("", transform(pixels,
      p => when(p * 64L > total, "1").otherwise("0")))
  }

  /** Batched partition-level decode: the real-codec integration point.
    * Partitions are first re-sized by payload bytes (decoders want
    * balanced work by bytes, not by row count), then each partition is
    * processed in `batchSize` groups through the decoder — mirroring
    * mapInPandas/Arrow-batch semantics in Scala.
    */
  trait BinaryBatchDecoder extends Serializable {
    /** schema of the struct appended per row */
    def outputSchema: StructType
    /** decode a batch of payloads into one Row per payload */
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row]
  }

  /** Deterministic stub decoder (no codec libs in this container). */
  class StubImageDecoder extends BinaryBatchDecoder {
    val outputSchema: StructType = StructType(Seq(
      StructField("width", LongType), StructField("height", LongType),
      StructField("channels", IntegerType)))
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] =
      payloads.map { b =>
        val n = b.length.toLong
        Row(n % 640L + 16L, (n * 7L) % 480L + 16L, 3)
      }
  }

  /** Run a batched decoder over a binary column; appends decoder output
    * columns. `targetPartitionBytes` rebalances partitions by payload
    * size before the decode (a 100 TB video table must not land 10k
    * 4K-frames on one task while another gets thumbnails). */
  def decodeBatched(
      df: DataFrame,
      binCol: String,
      decoder: BinaryBatchDecoder,
      batchSize: Int = 64,
      targetPartitionBytes: Long = 128L << 20): DataFrame = {
    // Partition count from logical-plan size stats (parquet footer
    // sizes), not an agg over octet_length — the latter is an extra full
    // scan of the binary column before the decode even starts. Statless
    // (RDD-backed) plans report Long.MaxValue: keep their current
    // partitioning instead of exploding to the 10000 cap.
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts =
      if (totalBytes >= BigInt(Long.MaxValue)) math.max(df.rdd.getNumPartitions, 1)
      else ((totalBytes / targetPartitionBytes) + 1).min(10000).max(1).toInt
    val outSchema = StructType(df.schema.fields ++ decoder.outputSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    // Dataset-domain mapPartitions (Encoders.row), NOT df.rdd +
    // createDataFrame: the decode stays one Catalyst plan (a single
    // serialize boundary around MapPartitions), so AQE still sizes the
    // repartition, downstream operators keep whole-stage codegen, and
    // there is no second re-encoding pass over every row.
    df.repartition(parts)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]](binIdx)))
          batch.lazyZip(decoded).map { (row, extra) =>
            Row.fromSeq(row.toSeq ++ extra.toSeq)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }
}
