package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch/stream sources, mirroring the reference DataSource surface
  * (sdk/python/feast/data_source.py:221-547, DataSource.proto:28-140):
  * every source declares an event-timestamp column, an optional
  * created-timestamp column, a field mapping (source column -> feature
  * name, applied forward on read — provider.py:251-260) and an optional
  * date partition column for partition-pruned scans.
  */
sealed trait DataSource extends Serializable {
  def eventTimestampColumn: String
  def createdTimestampColumn: Option[String]
  def fieldMapping: Map[String, String]
  def datePartitionColumn: Option[String]
}

/** Parquet/CSV/JSON/Delta path source (reference FileSource,
  * data_source.py:221-377). */
final case class FileSource(
    path: String,
    eventTimestampColumn: String,
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty,
    datePartitionColumn: Option[String] = None,
    format: String = "parquet",
    options: Map[String, String] = Map.empty) extends DataSource

/** Catalog table / temp view source — generalizes the reference's
  * BigQuery/Redshift table sources (bigquery.py:701-825) to anything
  * addressable through the Spark catalog. */
final case class TableSource(
    table: String,
    eventTimestampColumn: String,
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty,
    datePartitionColumn: Option[String] = None) extends DataSource

/** SQL-query source (reference BigQuerySource(query=...)). */
final case class QuerySource(
    query: String,
    eventTimestampColumn: String,
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty,
    datePartitionColumn: Option[String] = None) extends DataSource

/** In-memory DataFrame source — test/dev convenience; not persistable
  * to the registry. */
final case class DataFrameSource(
    @transient df: DataFrame,
    eventTimestampColumn: String,
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty) extends DataSource {
  def datePartitionColumn: Option[String] = None
}

/** Kafka stream source (reference data_source.py:380-462,
  * DataSource.proto:85-98). Unlike the reference — where stream sources
  * are declarative-only metadata — this engine consumes them with
  * Structured Streaming (graft.streaming). */
final case class KafkaSource(
    bootstrapServers: String,
    topic: String,
    messageFormat: StreamFormat,
    eventTimestampColumn: String,
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty,
    // "latest" (Spark's default) starts at the head and SKIPS records
    // produced before the query starts; a batch-materialize-then-stream
    // handoff that must not lose the gap passes "earliest" (or a JSON
    // per-partition offset map) — previously there was no way to opt
    // out of the silent skip (review r6)
    startingOffsets: String = "latest") extends DataSource {
  def datePartitionColumn: Option[String] = None
}

/** Kinesis stream source (reference data_source.py:465-547,
  * DataSource.proto:100-113) — declarative registry metadata, exactly
  * the reference's own treatment: it ships no in-tree Kinesis
  * consumer either (its KinesisSource never implements validation or
  * a query string). Views carry it through the registry round-trip so
  * a reference repo migrates losslessly; consuming it would ride a
  * Kinesis Structured-Streaming connector's readStream contract,
  * which this environment does not ship — [[SourceReader.readStream]]
  * fails loudly rather than silently reading nothing. */
final case class KinesisSource(
    region: String,
    streamName: String,
    recordFormat: StreamFormat,
    eventTimestampColumn: String,
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty) extends DataSource {
  def datePartitionColumn: Option[String] = None
}

/** File-backed stream source: replays a path as a stream via
  * spark.readStream (used for tests/bench where no broker exists). */
final case class FileStreamSource(
    path: String,
    format: String,
    eventTimestampColumn: String,
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty,
    maxFilesPerTrigger: Option[Int] = None,
    // extra reader options, passed through verbatim — a LONG-LIVED
    // watched landing dir needs `cleanSource` (delete/archive) so the
    // per-trigger directory listing stays O(unprocessed files) instead
    // of growing with everything ever processed (measured: latestOffset
    // 39 -> 107 ms inside a few generations without it)
    options: Map[String, String] = Map.empty) extends DataSource {
  def datePartitionColumn: Option[String] = None
}

sealed trait StreamFormat extends Serializable
object StreamFormat {
  /** Avro with an explicit schema json (decoded with from_avro). */
  final case class Avro(schemaJson: String) extends StreamFormat
  /** JSON with a Spark DDL schema string (decoded with from_json). */
  final case class Json(schemaDdl: String) extends StreamFormat
}

object SourceReader {
  import org.apache.spark.sql.functions._

  /** File-relation cache, the [[graft.sources.Tables.read]] policy
    * applied to declared sources: resolving a file source builds a
    * fresh file index (schema inference + listing job) per call, and
    * feature-store sessions read the same immutable declared paths for
    * every retrieval. Lazy logical plans only; stopped-session entries
    * purged on access. Writers INSIDE the engine (ingest, stream->log)
    * call [[invalidatePath]] after appending, so the next read re-lists;
    * a path mutated by an external process mid-session needs a new
    * session (same contract as [[graft.sources.Tables.read]]). */
  private val fileRelCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, Map[String, String]), DataFrame]()
  private val volatilePaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def cachedFileRel(
      spark: SparkSession, format: String, path: String,
      options: Map[String, String]): DataFrame = {
    if (volatilePaths.contains(path))
      return spark.read.format(format).options(options).load(path)
    fileRelCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    fileRelCache.computeIfAbsent((spark, format, path, options),
      _ => spark.read.format(format).options(options).load(path))
  }

  /** Drop cached relations for `path` (every session/format/options) —
    * called by engine writers after a one-shot append to a declared
    * source path (ingest). */
  def invalidatePath(path: String): Unit =
    fileRelCache.keySet.removeIf(k => k._3 == path)

  /** Mark `path` permanently uncacheable for this JVM — for paths a
    * STREAMING sink appends to continuously (logStream), where a
    * one-shot invalidation would still leave later reads stale. */
  def markVolatilePath(path: String): Unit = {
    volatilePaths.add(path)
    invalidatePath(path)
  }

  /** Batch read of a source: load, apply forward field mapping
    * (provider.py:251-260), leave timestamps native (session TZ is UTC —
    * O8 normalization happens at the session boundary). */
  def read(spark: SparkSession, source: DataSource): DataFrame = {
    val raw = source match {
      case f: FileSource => cachedFileRel(spark, f.format, f.path, f.options)
      case t: TableSource => spark.table(t.table)
      case q: QuerySource => spark.sql(q.query)
      case d: DataFrameSource => d.df
      // the declared reader options apply to the batch view too:
      // inferring a csv/header source without them reads header rows
      // as data and misnames every column (review r11)
      case s: FileStreamSource => cachedFileRel(spark, s.format, s.path, s.options)
      case k: KafkaSource =>
        throw new IllegalArgumentException(
          s"Kafka source ${k.topic} is stream-only; use graft.streaming")
      case k: KinesisSource =>
        // a descriptive error, not a MatchError: Kinesis is declarative
        // registry metadata (like the reference), with no batch view
        throw new IllegalArgumentException(
          s"Kinesis source ${k.streamName} is stream-only declarative " +
            "metadata; no batch read exists (and this environment ships " +
            "no Kinesis connector)")
    }
    applyFieldMapping(graft.sources.Tables.normalize(raw, Nil), source.fieldMapping)
  }

  /** Stream read (Structured Streaming). */
  def readStream(spark: SparkSession, source: DataSource): DataFrame = source match {
    case s: FileStreamSource =>
      // schema from the cached batch relation — re-inferring per call
      // re-paid the listing + footer read every time a stream starts
      // over the same immutable replay dir. Inference runs WITH the
      // declared reader options: inferring csv without header=true
      // named the columns _c0.._cN and typed everything string, then
      // handed that schema to a stream that DOES apply the options
      // (review r11)
      val schema = cachedFileRel(spark, s.format, s.path, s.options).schema
      val rdr = spark.readStream.schema(schema).format(s.format).options(s.options)
      val withOpt = s.maxFilesPerTrigger.fold(rdr)(n => rdr.option("maxFilesPerTrigger", n))
      // normalize like the BATCH path (NTZ -> session TimestampType):
      // without it the two paths over the same files disagreed on
      // timestamp semantics whenever the session TZ isn't UTC
      // (review r6); normalize is a pure projection, streaming-safe
      applyFieldMapping(
        graft.sources.Tables.normalize(withOpt.load(s.path), Nil), s.fieldMapping)
    case k: KafkaSource =>
      val raw = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", k.bootstrapServers)
        .option("subscribe", k.topic)
        .option("startingOffsets", k.startingOffsets)
        .load()
      applyFieldMapping(decodeKafkaValue(raw, k.messageFormat), k.fieldMapping)
    case k: KinesisSource =>
      // declarative-only, like the reference (no in-tree consumer
      // there either); this env ships no Kinesis connector — fail
      // loudly instead of silently reading nothing
      throw new UnsupportedOperationException(
        s"KinesisSource(${k.region}/${k.streamName}) is registry metadata: " +
          "no Kinesis Structured-Streaming connector is available in this " +
          "environment (the reference SDK declares but never consumes it)")
    case other =>
      throw new IllegalArgumentException(s"source $other is not streamable")
  }

  /** Decode a Kafka-shaped frame (binary `value` column) per the
    * declared stream format. Factored out of readStream so the decode
    * path is testable without a broker (batch df with the same shape). */
  def decodeKafkaValue(df: DataFrame, format: StreamFormat): DataFrame = format match {
    case StreamFormat.Avro(schemaJson) =>
      df.select(org.apache.spark.sql.avro.functions.from_avro(col("value"), schemaJson).as("v"))
        .select(col("v.*"))
    case StreamFormat.Json(ddl) =>
      df.select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(ddl)).as("v"))
        .select(col("v.*"))
  }

  def applyFieldMapping(df: DataFrame, mapping: Map[String, String]): DataFrame =
    if (mapping.isEmpty) df else df.withColumnsRenamed(mapping)
}
