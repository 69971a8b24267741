package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for training-data release: k-anonymity and
  * l-diversity over quasi-identifier columns (Sweeney 2002; Machanavajjhala
  * et al. 2007), plus the suppression transform that masks the records
  * an audit flags. The PII regex scrub ([[TextFunctions.piiScrub]])
  * removes direct identifiers from text; this measures the re-identification
  * risk left in the STRUCTURED columns that ride along with each record.
  *
  * Scale shape: the audit is one hash aggregation over the QI tuple
  * (count is map-side combinable; the distinct-sensitive count is
  * Spark's standard two-phase partial-distinct aggregate) — output is
  * one row per equivalence class, never per record. Suppression joins
  * the class verdicts back on the same QI key: with QI-grouped data
  * both sides shuffle on one key, and the class frame is dim-sized →
  * broadcast. No window, no self-join.
  */
object Privacy {

  /** Per-equivalence-class audit: every distinct quasi-identifier tuple
    * with its size k (how many records share the tuple — re-identification
    * risk is 1/k) and sensitive-attribute diversity l (distinct values
    * of `sensitiveCol` in the class — homogeneity attacks need l=1).
    *
    * @return one row per QI class: qiCols..., k, l, at_risk
    *         (k < minK OR l < minL)
    */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      minK: Int,
      minL: Int = 2): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k"),
        countDistinct(col(sensitiveCol)).as("l"))
      .withColumn("at_risk",
        (col("k") < minK || col("l") < minL).cast("int"))

  /** Suppression: records in at-risk classes get their QI columns
    * masked to NULL (the release-safe generalization floor); safe
    * records pass through. Returns the full frame with an extra
    * `suppressed` flag so downstream can count the utility cost. */
  def suppress(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      minK: Int,
      minL: Int = 2): DataFrame = {
    // Null-SAFE equi join on the QI tuple: the audit's groupBy treats a
    // null QI value as its own class, so the join-back must match it —
    // a null-unsafe join would silently DROP null-QI records from the
    // release instead of masking them. No broadcast hint: the verdict
    // frame's cardinality is the distinct-QI count, which approaches
    // |df| in exactly the many-singleton-classes case the audit exists
    // to catch — AQE broadcasts it when it is actually small.
    val verdicts = kAnonymityAudit(df, qiCols, sensitiveCol, minK, minL)
      .select(qiCols.map(c => col(c).as(s"__v_$c")) :+ col("at_risk"): _*)
    val cond = qiCols.map(c => col(c) <=> col(s"__v_$c")).reduce(_ && _)
    val joined = df.join(verdicts, cond)
    val masked = qiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, when(col("at_risk") === 1, lit(null)).otherwise(col(c)))
    }
    masked.withColumn("suppressed", col("at_risk"))
      .drop("at_risk").drop(qiCols.map(c => s"__v_$c"): _*)
  }
}
