package graft.sources

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, TimestampAddInterval}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DayTimeIntervalType, TimestampType}

/** Metadata-only timestamp bounds: min/max of a column straight from
  * parquet footer statistics, with NO Spark job.
  *
  * The PIT join needs the entity df's (min, max) event-ts once per call
  * to derive the feature-scan pruning window [min − ttl, max] (O5,
  * reference bigquery.py:418-437). That window is purely an
  * OPTIMIZATION — every candidate outside it is already excluded by the
  * per-row as-of predicate — so any SUPERSET of the true bounds is
  * correct, which is what makes footer stats usable even under
  * filters the trace ignores. When the entity frame is a projection
  * over a parquet relation and the ts column traces (through aliases,
  * optionally plus a constant day-time interval — the `orderdate +
  * INTERVAL 365 DAY` shape) to a physical INT64-micros column, the
  * bounds come from column-chunk statistics: one footer read per file
  * instead of a full-column aggregation job. At 100 TB that replaces a
  * scan of the ts column with O(files) driver metadata reads — bounded
  * here at [[MaxFooterFiles]] files, beyond which the distributed agg
  * (itself a narrow column scan) is the better plan anyway.
  *
  * Returns None whenever ANY precondition fails — unexpected plan
  * shape, non-parquet relation, partition-derived or non-timestamp
  * column, a file whose footer lacks stats for the column, INT96
  * timestamps (no usable stats) — and the caller falls back to the
  * aggregation job. Nulls need no care: parquet min/max stats ignore
  * nulls exactly like the agg's min()/max(), and a file with no
  * non-null value reports empty stats (skipped; it cannot contribute a
  * bound). An all-null column across all files yields None → fallback
  * agg returns (null, null), the already-handled no-bounds case.
  */
object FooterBounds {

  /** Above this many files the distributed agg beats serial
    * driver-side footer reads. */
  val MaxFooterFiles = 64

  /** (min, max) of `tsCol` over `df` from parquet footers alone, or
    * None when the plan/files don't support a metadata-only answer.
    * The result may be a superset of the true bounds when the plan
    * contains filters (they are traced through, not applied) — callers
    * must only use it for conservative pruning windows. */
  def tsBounds(df: DataFrame, tsCol: String): Option[(Timestamp, Timestamp)] = {
    try {
      val plan = df.queryExecution.analyzed
      for {
        attr0 <- plan.output.find(_.name == tsCol)
        (attr, shiftMicros) <- trace(plan, attr0, 0L)
        rel <- leafRelation(plan)
        colName <- physicalName(rel, attr)
        bounds <- footerMinMax(df, rel, colName)
      } yield (tsOf(bounds._1 + shiftMicros), tsOf(bounds._2 + shiftMicros))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Exact micros-since-epoch → Timestamp (sub-ms precision kept via
    * setNanos — truncating to ms would shrink the upper bound). */
  private def tsOf(micros: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos(Math.floorMod(micros, 1000000L).toInt * 1000)
    ts
  }

  /** Trace `attr` down through Project/SubqueryAlias/Filter layers to
    * the relation's own attribute, accumulating any constant day-time
    * interval shifts (`ts + INTERVAL ...`). Filters are skipped — safe
    * because the caller's contract is a superset window. */
  @annotation.tailrec
  private def trace(plan: LogicalPlan, attr: org.apache.spark.sql.catalyst.expressions.Attribute,
      shift: Long): Option[(org.apache.spark.sql.catalyst.expressions.Attribute, Long)] =
    plan match {
      case p: Project =>
        p.projectList.find(_.exprId == attr.exprId) match {
          case Some(ne) => unwrap(ne) match {
            case Some((a, d)) => trace(p.child, a, shift + d)
            case None => None
          }
          case None => None // attr not produced here — unexpected shape
        }
      case s: SubqueryAlias => trace(s.child, attr, shift)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        trace(f.child, attr, shift)
      case _: LogicalRelation =>
        if (plan.output.exists(_.exprId == attr.exprId)) Some((attr, shift)) else None
      case _ => None
    }

  /** One projection layer: attr, alias-of-attr, or alias-of
    * (attr + constant day-time interval), modulo identity
    * timestamp→timestamp casts the analyzer inserts around the add. */
  private def unwrap(e: Expression): Option[(org.apache.spark.sql.catalyst.expressions.Attribute, Long)] = {
    def stripNoopCast(x: Expression): Expression = x match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast
          if c.dataType == TimestampType && c.child.dataType == TimestampType =>
        stripNoopCast(c.child)
      case other => other
    }
    e match {
      case a: AttributeReference => Some((a, 0L))
      case Alias(child, _) => stripNoopCast(child) match {
        case a: AttributeReference => Some((a, 0L))
        case TimestampAddInterval(a: AttributeReference,
            Literal(micros: Long, _: DayTimeIntervalType), _) => Some((a, micros))
        case _ => None
      }
      case _ => None
    }
  }

  private def leafRelation(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan.collectLeaves() match {
      case Seq(lr: LogicalRelation) => lr.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] => Some(fs)
        case _ => None
      }
      case _ => None
    }

  /** The physical parquet column name for `attr`, provided it is a
    * top-level TimestampType DATA column (partition columns have no
    * footer stats). */
  private def physicalName(rel: HadoopFsRelation,
      attr: org.apache.spark.sql.catalyst.expressions.Attribute): Option[String] =
    if (attr.dataType == TimestampType &&
        rel.dataSchema.fieldNames.contains(attr.name) &&
        !rel.partitionSchema.fieldNames.contains(attr.name))
      Some(attr.name)
    else None

  /** Min/max micros across every file's column-chunk stats; None if any
    * file lacks usable INT64-micros stats for the column. */
  private def footerMinMax(df: DataFrame, rel: HadoopFsRelation,
      colName: String): Option[(Long, Long)] = {
    val files = rel.location.inputFiles
    if (files.isEmpty || files.length > MaxFooterFiles) return None
    val conf = df.sparkSession.sessionState.newHadoopConf()
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var seen = false
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        if (!schema.containsField(colName)) return None
        val fld = schema.getFields.get(schema.getFieldIndex(colName))
        if (!fld.isPrimitive) return None
        val prim = fld.asPrimitiveType()
        val micros = prim.getPrimitiveTypeName == PrimitiveTypeName.INT64 &&
          (prim.getLogicalTypeAnnotation match {
            case t: TimestampLogicalTypeAnnotation =>
              t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS
            case _ => false
          })
        if (!micros) return None
        val idx = schema.getFieldIndex(colName)
        reader.getFooter.getBlocks.asScala.foreach { block =>
          val chunk = block.getColumns.get(idx)
          val stats = chunk.getStatistics
          // stats missing/untrusted for a chunk with rows → can't bound
          if (stats == null || stats.isEmpty) {
            if (block.getRowCount > 0 && chunk.getValueCount > 0) return None
          } else if (stats.hasNonNullValue) {
            val lo = stats.genericGetMin.asInstanceOf[java.lang.Long].longValue()
            val hi = stats.genericGetMax.asInstanceOf[java.lang.Long].longValue()
            if (lo < mn) mn = lo
            if (hi > mx) mx = hi
            seen = true
          }
          // hasNonNullValue == false: all-null chunk, contributes nothing
        }
      } finally reader.close()
    }
    if (seen) Some((mn, mx)) else None
  }
}
