package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs as batched partition-level functions.
  *
  * Decode is REAL for every JDK-native format — [[Multimodal.ImageIoDecoder]]
  * (JPEG/PNG/BMP/GIF via `javax.imageio`, true dimensions + pixel
  * average-hash), [[Multimodal.ImageResizer]] (area-average downscale,
  * lossless re-encode), and [[Multimodal.WavPcmDecoder]] (hand-parsed
  * RIFF/PCM header facts + RMS + zero crossings) — no external codec
  * library needed — and [[Multimodal.Mp4MetaDecoder]] walks the ISO-BMFF
  * box tree (a public layout, codec-free) for video duration /
  * dimensions / track counts. The deterministic stub
  * (`StubImageDecoder`) remains only as the integration example for
  * payloads whose DECODE truly needs codec libraries (video frames,
  * webp, …): swap in a JNI/library-backed
  * [[Multimodal.BinaryBatchDecoder]] with the same column contract.
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
      .when(substring(bin, 1, 2).cast("string") === "BM", "bmp")
      .when(substring(bin, 1, 4).cast("string") === "RIFF" &&
        substring(bin, 9, 4).cast("string") === "WAVE", "wav")
      .when(substring(bin, 1, 4).cast("string") === "RIFF", "riff")
      .when(substring(bin, 5, 4).cast("string") === "ftyp", "mp4")
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

  /** Deterministic resize-GEOMETRY stub (kept for payloads no JDK
    * codec can decode — [[ImageResizer]] is the real path for
    * jpeg/png/bmp/gif): computes the fit-within-box
    * output geometry (aspect-preserving, never upscaling) and the
    * resulting byte estimate from the stub-decoded dimensions. The
    * arithmetic is pure integer/double columns, so the plumbing is
    * value-verifiable end-to-end; a production build swaps the payload
    * transform, keeping this exact column contract. */
  def stubResize(decoded: Column, boxW: Int, boxH: Int): Column = {
    val w = decoded.getField("width").cast("double")
    val h = decoded.getField("height").cast("double")
    val scale = least(lit(boxW.toDouble) / w, lit(boxH.toDouble) / h, lit(1.0))
    // clamp to 1px exactly like [[ImageResizer]] (math.max(1, floor)):
    // an extreme aspect ratio (1×1000 into 100×10) otherwise emits a
    // zero-width geometry the real resizer never produces (review r12)
    val outW = greatest(floor(w * scale).cast("long"), lit(1L))
    val outH = greatest(floor(h * scale).cast("long"), lit(1L))
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
    * near-dup signal. This BYTE-domain variant (for payloads no JDK
    * codec decodes; [[averageHash64]] is the real pixel-domain hash)
    * tiles 64 evenly spaced payload bytes (the same deterministic
    * sampling as [[sampleFrames]]) — the thresholding, packing, and downstream
    * banding are the real algorithm. Thresholding is pure integer
    * arithmetic (64·pixel > sum, never a float mean), and the hash is
    * emitted as a 64-char bit string, so the oracle replays it
    * bit-for-bit. Near-dup pairing reuses the SimHash band machinery
    * (split the 64 bits into bands, bucket-join on band equality).
    * Caller must filter empty payloads. */
  def stubAverageHash(bin: Column): Column = {
    val len = octet_length(bin)
    val pixelsExpr = transform(sequence(lit(0), lit(63)), k => {
      val pos = (floor(k.cast("double") * (len - 1).cast("double") / lit(63.0)) + 1).cast("int")
      conv(hex(bin.substr(pos, lit(1))), 16, 10).cast("long")
    })
    // pixels AND their total are bound ONCE as lambda variables before
    // the per-bit comparison (HOF lambdas get no CSE): referencing the
    // aggregate directly inside the bit lambda re-sampled all 64
    // pixels per output bit — 64x the documented one-pass cost, and a
    // caller fanning the bit string into band slices multiplied it
    // again (measured 70s for a 5k-doc pairing; review r6)
    val bound = transform(array(pixelsExpr), pixels =>
      struct(pixels.as("px"),
        aggregate(pixels, lit(0L), (acc, p) => acc + p).as("tot")))
    element_at(transform(bound, s =>
      concat_ws("", transform(s.getField("px"),
        p => when(p * 64L > s.getField("tot"), "1").otherwise("0")))), 1)
  }

  /** Hamming near-duplicate pairs over fixed-width fingerprint
    * bit-strings (the [[stubAverageHash]] output) via pigeonhole band
    * blocking — image near-dup pairing at corpus scale. The 64-bit
    * fingerprint splits into `bands` equal slices; two fingerprints
    * within hamming distance `maxDist` < `bands` must agree on at
    * least one WHOLE band (pigeonhole), so every qualifying pair meets
    * in an equi-join bucket on (band_idx, band_value) and the
    * quadratic all-pairs comparison never plans — the same blocking
    * discipline as the MinHash-LSH dedup, but with EXACT recall
    * (pigeonhole is a theorem, not a probability) for
    * maxDist < bands, PROVIDED no band bucket exceeds
    * `maxBucketSize`: degenerate buckets (a band value shared by a
    * giant slice of the corpus — e.g. millions of identical blank
    * images) are dropped at the cap, the [[Dedup]] guard, because
    * their pair OUTPUT is itself quadratic — n identical fingerprints
    * have n²/2 hamming-0 pairs no algorithm can avoid enumerating.
    * Callers needing those should exact-group identical fingerprints
    * first (a hash aggregation) and treat each group as one unit.
    * Candidates surviving the block are verified with the true
    * hamming distance — a flat per-band bit_count(XOR) sum that
    * whole-stage-codegens (no higher-order-function lambdas on the
    * pair path). Output (id_a, id_b, hamming) with id_a < id_b, one
    * row per pair regardless of how many bands matched. */
  def phashNearDupPairs(
      df: DataFrame, idCol: String, bitsCol: String,
      bands: Int = 4, maxDist: Int = 3,
      maxBucketSize: Int = 1 << 16): DataFrame = {
    // bands >= 2 (mirroring simhashNearDupPairs' guard): at bands=1 the
    // whole 64-bit fingerprint parses as one band via conv(..,2,10),
    // whose unsigned value overflows the signed-long cast for any
    // fingerprint with the MSB set — NULL band values fall out of the
    // equi-join and half the fingerprint space silently loses its
    // hamming-0 pairs. bands=1 only ever permits maxDist=0, which is
    // exact duplication — a plain groupBy, not this operator.
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 and be >= 2, got $bands")
    require(maxDist < bands,
      s"pigeonhole exactness needs maxDist < bands, got maxDist=$maxDist bands=$bands")
    val w = 64 / bands
    // bind the fingerprint ONCE before slicing into bands: bitsCol may
    // be a computed expression (the stub hash), and an unbound
    // reference would inline it `bands` times into this projection
    val bandInts = element_at(transform(array(col(bitsCol)), bits =>
      array((0 until bands).map(i =>
        conv(substring(bits, i * w + 1, w), 2, 10).cast("long")): _*)), 1)
    val expl = df
      .select(col(idCol).as("__id"), bandInts.as("__bands"))
      .select(col("__id"), col("__bands"),
        posexplode(col("__bands")).as(Seq("__band_idx", "__band_val")))
    val live = expl.join(
      expl.groupBy("__band_idx", "__band_val").agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize)
        .select("__band_idx", "__band_val"),
      Seq("__band_idx", "__band_val"))
    val a = live.select(col("__band_idx"), col("__band_val"),
      col("__id").as("__ida"), col("__bands").as("__ba"))
    val b = live.select(col("__band_idx"), col("__band_val"),
      col("__id").as("__idb"), col("__bands").as("__bb"))
    val ham = (0 until bands).map { i =>
      call_function("bit_count",
        element_at(col("__ba"), i + 1).bitwiseXOR(element_at(col("__bb"), i + 1)))
        .cast("long")
    }.reduce(_ + _)
    a.join(b, Seq("__band_idx", "__band_val"))
      .filter(col("__ida") < col("__idb"))
      .select(col("__ida"), col("__idb"), col("__ba"), col("__bb"))
      .distinct()
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxDist)
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"), col("hamming"))
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

  /** Backend contract for real video FRAME extraction — the one decode
    * the container cannot do natively (JDK ships no video codec; the
    * ISO-BMFF METADATA walk is [[Mp4MetaDecoder]]). A deployment with
    * codec jars (jcodec, javacv/ffmpeg bindings) implements this
    * one-method trait and names the class via
    * `-Dgraft.video.backend=<fqcn>` (or the constructor arg) — frames
    * flow through the same [[decodeBatched]] plumbing with no fork.
    * Implementations need a no-arg constructor and must be
    * serializable (instantiated per executor). */
  trait VideoFrameBackend extends Serializable {
    /** `n` frames sampled evenly across the clip, each an encoded
      * still image (the downstream contract: feed [[ImageIoDecoder]] /
      * [[ImageResizer]]). */
    def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** Video frame extraction behind the [[VideoFrameBackend]] SPI.
    * Without a configured backend this fails LOUDLY at construction,
    * naming exactly what to provide (the KinesisSource pattern:
    * declare the capability, never silently stub the data path —
    * byte-slice [[sampleFrames]] exists separately and says what it
    * is). Per-payload decode failures quarantine into `decode_error`
    * like every other decoder, so one corrupt clip cannot fail a
    * 100 TB scan. */
  class VideoFrameDecoder(n: Int, backendClass: Option[String] = None)
      extends BinaryBatchDecoder {
    require(n > 0, s"frame count must be positive, got $n")
    private val clsName: String = backendClass
      .orElse(sys.props.get("graft.video.backend"))
      .getOrElse(throw new UnsupportedOperationException(
        "no video frame backend configured: video frame decode needs a codec " +
          "library this environment does not ship. Provide a class implementing " +
          "graft.functions.Multimodal.VideoFrameBackend (e.g. backed by jcodec or " +
          "javacv/ffmpeg) on the classpath and name it via " +
          "-Dgraft.video.backend=<fqcn> or the VideoFrameDecoder constructor. " +
          "For metadata use Mp4MetaDecoder; for codec-free byte sampling use sampleFrames."))
    // fail fast on the DRIVER if the class is absent/wrong — a doomed
    // decode must not ship to a thousand executors first
    locally {
      val c = try Class.forName(clsName) catch {
        case e: ClassNotFoundException => throw new UnsupportedOperationException(
          s"video frame backend '$clsName' is not on the classpath", e)
      }
      require(classOf[VideoFrameBackend].isAssignableFrom(c),
        s"video frame backend '$clsName' does not implement VideoFrameBackend")
      try { val _ = c.getDeclaredConstructor() } catch {
        case _: NoSuchMethodException => throw new IllegalArgumentException(
          s"video frame backend '$clsName' needs a no-arg constructor " +
            "(it is instantiated per executor)")
      }
    }
    // instantiated lazily per executor JVM (the decoder object itself
    // serializes as just the class name + n)
    @transient private lazy val backend: VideoFrameBackend =
      Class.forName(clsName).getDeclaredConstructor()
        .newInstance().asInstanceOf[VideoFrameBackend]

    val outputSchema: StructType = StructType(Seq(
      StructField("frames", ArrayType(BinaryType)),
      StructField("decode_error", StringType)))
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = payloads.map { b =>
      try {
        val fr = backend.frames(b, n)
        // a backend returning null instead of throwing must still
        // quarantine: frames=null with decode_error=null would read as
        // a SUCCESSFUL decode with no data downstream
        if (fr == null) Row(null, "backend returned null frames")
        else Row(fr, null)
      } catch { case e: Exception =>
        Row(null, s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      }
    }
  }

  /** Deterministic stub decoder (no codec libs in this container). */
  class StubImageDecoder extends BinaryBatchDecoder {
    val outputSchema: StructType = StructType(Seq(
      StructField("width", LongType), StructField("height", LongType),
      StructField("channels", IntegerType)))
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] =
      payloads.map { b =>
        // NULL binary cells quarantine like every real decoder (an NPE
        // here killed the whole task ×4 retries — review r12)
        if (b == null) Row(null, null, null)
        else {
          val n = b.length.toLong
          Row(n % 640L + 16L, (n * 7L) % 480L + 16L, 3)
        }
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
      targetPartitionBytes: Long = 128L << 20,
      numPartitions: Option[Int] = None): DataFrame = {
    // Partition count from logical-plan size stats (parquet footer
    // sizes), not an agg over octet_length — the latter is an extra full
    // scan of the binary column before the decode even starts. Statless
    // (RDD-backed) plans report Long.MaxValue: keep their current
    // partitioning instead of exploding to the 10000 cap.
    // `numPartitions` pins the decode parallelism explicitly — for
    // plans whose stats CANNOT reflect the payload bytes (synthesized
    // columns, post-shuffle MapPartitions): the heuristic below would
    // read their tiny logical estimate and collapse the decode to ONE
    // task (caught by ScaleCheck: the audio query went 15x super-linear
    // at 10x data running 105M samples single-threaded). Parquet-backed
    // payload scans carry real footer sizes and keep the stats path.
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = numPartitions.getOrElse {
      if (totalBytes >= BigInt(Long.MaxValue)) math.max(df.rdd.getNumPartitions, 1)
      else ((totalBytes / targetPartitionBytes) + 1).min(10000).max(1).toInt
    }
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
          // lazyZip TRUNCATES to the shorter side: a third-party SPI
          // decoder that drops failed payloads (instead of emitting
          // error rows) would silently lose the tail of every batch AND
          // misalign the survivors — fail loudly (review r12)
          require(decoded.size == batch.size,
            s"decoder ${decoder.getClass.getName} returned ${decoded.size} rows " +
              s"for a ${batch.size}-payload batch — one output row per input " +
              "payload is the decodeBatch contract (emit error rows, don't drop)")
          batch.lazyZip(decoded).map { (row, extra) =>
            Row.fromSeq(row.toSeq ++ extra.toSeq)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** REAL image decode via the JDK's own codecs (`javax.imageio` ships
    * JPEG/PNG/BMP/GIF readers in `java.desktop` — no external library,
    * headless-safe): dimensions, channel count, and a REAL perceptual
    * average-hash over the decoded pixels (luma → 8×8 cell means →
    * above-mean bits, MSB-first row-major — the classic aHash). A
    * payload ImageIO cannot decode yields nulls + `decode_error`
    * instead of failing the task: one corrupt file in a 100 TB corpus
    * must not kill the job; the error column is the quarantine filter.
    *
    * This replaces the stub for every JDK-supported format; the stub
    * remains only as the integration example for codecs the JDK lacks
    * (video containers, webp, …). */
  class ImageIoDecoder extends BinaryBatchDecoder {
    val outputSchema: StructType = StructType(Seq(
      StructField("width", LongType), StructField("height", LongType),
      StructField("channels", IntegerType), StructField("ahash64", LongType),
      StructField("decode_error", StringType)))

    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = {
      Multimodal.disableImageIoDiskCache()
      payloads.map(decodeOne)
    }

    private def decodeOne(b: Array[Byte]): Row = 
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) Row(null, null, null, null, "unrecognized image format")
        else Row(img.getWidth.toLong, img.getHeight.toLong,
          img.getColorModel.getNumComponents, Multimodal.averageHash64(img), null)
      } catch {
        case e: Exception =>
          Row(null, null, null, null,
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      }
  }

  /** REAL image resize (the resize integration point, no longer a
    * stub for JDK-decodable formats): decode via `javax.imageio`,
    * aspect-preserving fit-within-box (never upscaling), AREA-AVERAGE
    * downsample by exact cell mapping (each source pixel contributes
    * to the one output cell `(y*outH/h, x*outW/w)` — deterministic
    * integer mapping, no resample kernel or Graphics2D to disagree
    * about), re-encoded as PNG (lossless — the resized payload
    * round-trips pixel-exact). Output geometry is the same arithmetic
    * as [[stubResize]], so the SQL oracle can recompute it; undecodable
    * payloads quarantine via `decode_error` like [[ImageIoDecoder]]. */
  class ImageResizer(boxW: Int, boxH: Int) extends BinaryBatchDecoder {
    require(boxW > 0 && boxH > 0, s"resize box must be positive, got ${boxW}x$boxH")
    val outputSchema: StructType = StructType(Seq(
      StructField("resized", BinaryType),
      StructField("out_width", LongType), StructField("out_height", LongType),
      StructField("decode_error", StringType)))

    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = {
      Multimodal.disableImageIoDiskCache()
      payloads.map { b =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          if (img == null) Row(null, null, null, "unrecognized image format")
          else {
            val w = img.getWidth
            val h = img.getHeight
            val scale = math.min(math.min(boxW.toDouble / w, boxH.toDouble / h), 1.0)
            val outW = math.max(1, math.floor(w * scale).toInt)
            val outH = math.max(1, math.floor(h * scale).toInt)
            val sums = new Array[Long](outW * outH * 3)
            val counts = new Array[Long](outW * outH)
            // bulk row reads: per-pixel getRGB(x, y) pays a color-model
            // conversion + bounds check PER CALL and dominated the
            // resize wall on the corpus-scale decode path this class
            // advertises; the bulk form converts a row at a time with
            // identical values (review r12)
            val rowBuf = new Array[Int](w)
            var y = 0
            while (y < h) {
              val cy = math.min((y.toLong * outH / h).toInt, outH - 1)
              img.getRGB(0, y, w, 1, rowBuf, 0, w)
              var x = 0
              while (x < w) {
                val cx = math.min((x.toLong * outW / w).toInt, outW - 1)
                val rgb = rowBuf(x)
                val c = cy * outW + cx
                sums(c * 3) += (rgb >> 16) & 0xff
                sums(c * 3 + 1) += (rgb >> 8) & 0xff
                sums(c * 3 + 2) += rgb & 0xff
                counts(c) += 1
                x += 1
              }
              y += 1
            }
            val out = new java.awt.image.BufferedImage(
              outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var c = 0
            while (c < outW * outH) {
              val n = math.max(counts(c), 1L)
              out.setRGB(c % outW, c / outW,
                (((sums(c * 3) / n).toInt & 0xff) << 16) |
                (((sums(c * 3 + 1) / n).toInt & 0xff) << 8) |
                ((sums(c * 3 + 2) / n).toInt & 0xff))
              c += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row(bos.toByteArray, outW.toLong, outH.toLong, null)
          }
        } catch {
          case e: Exception => Row(null, null, null,
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        }
      }
    }
  }

  /** REAL video-container metadata: the ISO base media file format
    * (MP4/MOV, ISO 14496-12) is a public box tree — `[size u32 BE]
    * [type 4cc][payload]`, children nested in container boxes — so
    * duration, dimensions, and track layout parse with NO codec:
    *
    *  - `moov/mvhd`: movie timescale + duration (version 0: u32s at
    *    offsets 12/16 of the box payload; version 1: u64 duration)
    *  - `moov/trak/tkhd`: track width/height as 16.16 fixed point in
    *    the last 8 bytes of the box; a non-zero size marks the video
    *    track
    *  - `moov/trak/mdia/hdlr`: handler 4cc (`vide`/`soun`) counted per
    *    kind
    *
    * This is the routing/dedup metadata a video pipeline needs (frame
    * DECODE genuinely requires codec libraries and stays stubbed).
    * Truncated/alien payloads quarantine via `decode_error`. */
  class Mp4MetaDecoder extends BinaryBatchDecoder {
    val outputSchema: StructType = StructType(Seq(
      StructField("duration_ms", LongType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("video_tracks", IntegerType), StructField("audio_tracks", IntegerType),
      StructField("decode_error", StringType)))

    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = payloads.map { b =>
      try decodeOne(b)
      catch {
        case e: Exception => Row(null, null, null, null, null,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      }
    }

    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def cc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk one box level in [from, to); calls f(type, bodyFrom, bodyTo). */
    private def boxes(b: Array[Byte], from: Int, to: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val size0 = u32(b, pos)
        val tpe = cc(b, pos + 4)
        val (body, end) =
          if (size0 == 1) { // 64-bit largesize
            require(pos + 16 <= to, s"truncated largesize box at $pos")
            val sz = u64(b, pos + 8)
            require(sz >= 16 && pos + sz <= to, s"box '$tpe' overruns payload")
            (pos + 16, pos + sz.toInt)
          } else if (size0 == 0) (pos + 8, to) // box extends to EOF
          else {
            require(size0 >= 8 && pos + size0 <= to, s"box '$tpe' overruns payload")
            (pos + 8, pos + size0.toInt)
          }
        f(tpe, body, end)
        pos = end
      }
    }

    private def decodeOne(b: Array[Byte]): Row = {
      // sanity: an ISO-BMFF file opens with a box whose type is ftyp /
      // moov / mdat / free / wide / styp — reject alien bytes early
      require(b.length >= 12, "payload too short for an ISO-BMFF box")
      val first = cc(b, 4)
      require(Set("ftyp", "moov", "mdat", "free", "wide", "styp").contains(first),
        s"not an ISO-BMFF payload (first box '$first')")
      var durationMs: Any = null
      var width: Any = null
      var height: Any = null
      var vTracks = 0
      var aTracks = 0
      boxes(b, 0, b.length) { (t0, b0, e0) =>
        if (t0 == "moov") boxes(b, b0, e0) { (t1, b1, e1) =>
          t1 match {
            case "mvhd" =>
              // fixed-offset reads must stay INSIDE the declared box: a
              // truncated mvhd otherwise reads the NEXT box's bytes as
              // timescale/duration — garbage metadata reported as a
              // SUCCESSFUL decode (review r12)
              val version = b(b1) & 0xff
              require(e1 - b1 >= (if (version == 1) 32 else 20),
                s"truncated mvhd box (${e1 - b1} bytes, version $version)")
              // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) dur(4)
              // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) dur(8)
              val (timescale, duration) =
                if (version == 1) (u32(b, b1 + 20), u64(b, b1 + 24))
                else (u32(b, b1 + 12), u32(b, b1 + 16))
              if (timescale > 0) durationMs = duration * 1000L / timescale
            case "trak" =>
              var isVideo = false
              var isAudio = false
              var tw = 0L
              var th = 0L
              boxes(b, b1, e1) { (t2, b2, e2) =>
                t2 match {
                  case "tkhd" =>
                    // width/height: 16.16 fixed point, the LAST 8 bytes;
                    // a body under 8 bytes would reach back into the box
                    // HEADER (review r12)
                    require(e2 - b2 >= 8, s"truncated tkhd box (${e2 - b2} bytes)")
                    tw = u32(b, e2 - 8) >> 16
                    th = u32(b, e2 - 4) >> 16
                  case "mdia" => boxes(b, b2, e2) { (t3, b3, e3) =>
                    if (t3 == "hdlr" && e3 - b3 >= 12) cc(b, b3 + 8) match {
                      case "vide" => isVideo = true
                      case "soun" => isAudio = true
                      case _ => ()
                    }
                  }
                  case _ => ()
                }
              }
              if (isVideo) {
                vTracks += 1
                if (tw > 0 && th > 0) { width = tw; height = th }
              }
              if (isAudio) aTracks += 1
            case _ => ()
          }
        }
      }
      Row(durationMs, width, height, vTracks, aTracks, null)
    }
  }

  /** ImageIO wraps every read/write stream in a DISK-backed cache file
    * by default — one temp-file create/delete per payload, measured
    * dominating the decode wall at corpus row counts. Memory-cached
    * streams are strictly better for byte-array payloads. JVM-global,
    * idempotent. */
  @volatile private var imageIoCacheDisabled = false
  def disableImageIoDiskCache(): Unit =
    if (!imageIoCacheDisabled) {
      javax.imageio.ImageIO.setUseCache(false)
      imageIoCacheDisabled = true
    }

  /** The classic 64-bit average hash over decoded pixels: Rec.601 luma
    * per pixel, pixels binned into the 8×8 grid by index mapping
    * (cell = (y*8/h, x*8/w) — every pixel lands in exactly one cell, no
    * resample kernel to disagree about), cell means thresholded by the
    * global mean, bit 63 = cell (0,0). Deterministic integer/double
    * arithmetic over whatever the codec decoded. */
  def averageHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    // bulk row reads — same rationale as [[ImageResizer]] (review r12)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * 8 / h).toInt
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val cx = (x.toLong * 8 / w).toInt
        val rgb = rowBuf(x)
        val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val c = cy * 8 + cx
        sums(c) += luma
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i => if (counts(i) == 0) 0.0 else sums(i) / counts(i))
    val grand = means.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (means(i) > grand) bits |= (1L << (63 - i))
      i += 1
    }
    bits
  }

  /** REAL audio decode: hand-parsed RIFF/WAVE PCM (the container format
    * is a public fixed layout — no library needed): header facts
    * (sample rate, channels, bit depth, frame count, duration) plus the
    * two classic cheap features — RMS energy (all channels, normalized
    * to [-1, 1]) and channel-0 zero-crossing count. PCM16 LE and PCM8
    * unsigned supported; anything else (float, compressed) reports
    * `decode_error`. Truncated/corrupt payloads quarantine the same
    * way. */
  class WavPcmDecoder extends BinaryBatchDecoder {
    val outputSchema: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
      StructField("bits", IntegerType), StructField("n_frames", LongType),
      StructField("duration_ms", LongType), StructField("rms", DoubleType),
      StructField("zero_crossings", LongType), StructField("decode_error", StringType)))

    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = payloads.map { b =>
      try decodeOne(b)
      catch {
        case e: Exception => Row(null, null, null, null, null, null, null,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      }
    }

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def decodeOne(b: Array[Byte]): Row = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        "not a RIFF/WAVE payload")
      var pos = 12
      var fmtOk = false
      var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
      var dataOff = -1; var dataLen = 0L
      while (pos + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
        val id = tag(b, pos)
        val sz = u32(b, pos + 4)
        val body = pos + 8
        id match {
          case "fmt " =>
            require(sz >= 16 && body + 16 <= b.length, "truncated fmt chunk")
            val audioFormat = u16(b, body)
            require(audioFormat == 1, s"unsupported WAVE format code $audioFormat (PCM only)")
            channels = u16(b, body + 2)
            rate = u32(b, body + 4).toInt
            blockAlign = u16(b, body + 12)
            bits = u16(b, body + 14)
            require(bits == 16 || bits == 8, s"unsupported bit depth $bits")
            require(channels > 0 && blockAlign == channels * (bits / 8),
              s"inconsistent block align $blockAlign")
            fmtOk = true
          case "data" =>
            dataOff = body
            dataLen = sz
          case _ => () // LIST/INFO etc: skip
        }
        val next = body + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        // a corrupt 32-bit chunk size (e.g. 0xFFFFFFF8 -> sz.toInt = -8)
        // can make `next` fail to advance — an infinite loop is a HANG,
        // not an Exception, so the quarantine wrapper would never fire;
        // fail loudly into decode_error instead (review r12)
        require(next > pos, s"corrupt chunk size $sz at offset $pos")
        pos = next
      }
      require(fmtOk, "missing fmt chunk")
      require(dataOff >= 0, "missing data chunk")
      require(dataOff + dataLen <= b.length, "data chunk overruns payload")
      val nFrames = dataLen / blockAlign
      var sumSq = 0.0
      var zc = 0L
      var prevSign = 0
      var f = 0L
      while (f < nFrames) {
        val base = dataOff + (f * blockAlign).toInt
        var ch = 0
        while (ch < channels) {
          val v =
            if (bits == 16) u16(b, base + ch * 2).toShort.toInt / 32768.0
            else ((b(base + ch) & 0xff) - 128) / 128.0
          sumSq += v * v
          if (ch == 0) {
            val sign = if (v > 0) 1 else if (v < 0) -1 else 0
            if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
            if (sign != 0) prevSign = sign
          }
          ch += 1
        }
        f += 1
      }
      val rms = if (nFrames == 0) 0.0 else math.sqrt(sumSq / (nFrames * channels))
      Row(rate, channels, bits, nFrames,
        nFrames * 1000L / rate, rms, zc, null)
    }
  }
}
