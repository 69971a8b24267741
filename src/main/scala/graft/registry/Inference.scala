package graft.registry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.model._

/** Schema inference (reference feast/inference.py:12-118 and
  * feature_view.py:268-300): event-timestamp column discovery, entity
  * value-type inference, and feature inference from a source schema.
  */
object Inference {

  /** Infer the event-timestamp column: the single timestamp-typed column
    * in the schema (inference.py:62-118). Ambiguity is an error; a
    * column literally named 'event_timestamp' wins outright. */
  def inferEventTimestampColumn(df: DataFrame): String = {
    val tsCols = df.schema.fields.collect {
      case f if f.dataType == TimestampType || f.dataType == TimestampNTZType => f.name
    }
    tsCols.find(_ == "event_timestamp").getOrElse {
      tsCols match {
        case Array(one) => one
        case Array() => throw new IllegalArgumentException(
          "no timestamp column found to use as event_timestamp")
        case many => throw new IllegalArgumentException(
          s"ambiguous event timestamp column, candidates: ${many.mkString(", ")}")
      }
    }
  }

  /** Infer an entity's value type from its join-key column in the view's
    * source (inference.py:12-59). */
  def inferEntityType(df: DataFrame, joinKey: String): GraftType = {
    val field = df.schema.fields.find(_.name == joinKey).getOrElse(
      throw new IllegalArgumentException(s"join key '$joinKey' not in source schema"))
    GraftType.fromSpark(field.dataType)
  }

  /** Infer features = all columns except entity join keys, timestamp
    * columns, and __-prefixed internals (feature_view.py:268-300). */
  def inferFeatures(
      df: DataFrame,
      joinKeys: Seq[String],
      tsCol: String,
      createdCol: Option[String]): Seq[Feature] = {
    val excluded = (joinKeys :+ tsCol) ++ createdCol.toSeq
    df.schema.fields.toSeq
      .filterNot(f => excluded.contains(f.name) || f.name.startsWith("__"))
      .map(f => Feature(f.name, GraftType.fromSpark(f.dataType)))
  }
}
