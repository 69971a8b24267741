package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches: count-min (Cormode & Muthukrishnan
  * 2005) — the fixed-memory answer to "which tokens/domains/keys are
  * hot?" over a corpus too large to count exactly per key.
  *
  * Scale shape: the sketch is a depth×width counter TABLE (a few
  * thousand cells regardless of corpus size) built by ONE
  * map-side-combinable aggregation — each occurrence contributes
  * `depth` (row, bucket) increments, partial-aggregated before the
  * exchange, so the shuffle carries at most depth×width cells per map
  * task no matter how skewed the items. Estimates are overestimates
  * only (collisions add, never subtract): est(x) = min over rows of
  * cell(row, h_row(x)) ≥ true(x), within εN with probability 1−δ for
  * width = e/ε, depth = ln(1/δ). Sketches over shards merge by cell
  * addition — the property that makes this a streaming/partitioned
  * structure, unlike an exact top-k.
  *
  * Determinism contract (DuckDB oracle replay): row hashes are
  * md5("cm<row>:" || item) truncated to 8 hex chars and parsed as an
  * integer — both engines lowercase-hex md5, so buckets, cells and
  * minima replay bit-for-bit.
  */
object Sketch {

  /** Bucket of `item` in hash row `row`: md5-derived, mod width. */
  private def bucket(item: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cm$row:"), item)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** The item's `depth` cell buckets as an array — public so streaming
    * aggregations can maintain the sketch cells as their (bounded)
    * state. The guard lives HERE (the shared entry point): width=0
    * through the streaming builder previously produced null buckets
    * and a silently empty sketch instead of an error (review r6). */
  def cellBuckets(item: Column, depth: Int, width: Int): Column = {
    require(depth > 0 && width > 0, s"need depth/width > 0, got $depth/$width")
    array((0 until depth).map(r => bucket(item, r, width)): _*)
  }

  /** The depth×width counter table: one row per non-empty cell,
    * (row, bucket, cnt). One exploded narrow projection + one hash
    * aggregation; output is sketch-sized, never corpus-sized. NULL
    * items are excluded on build AND probe (a null has no hashable
    * identity; its md5 buckets are null and would silently fall out of
    * the probe join anyway — the filter makes the contract explicit). */
  def countMinTable(
      items: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame =
    items
      .filter(col(itemCol).isNotNull)
      .select(posexplode(cellBuckets(col(itemCol), depth, width))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Heavy hitters by count-min estimate: candidates are the DISTINCT
    * items (vocabulary-grain, not corpus-grain), each probing its
    * `depth` cells in the broadcast sketch; est = min over rows.
    * `exact` rides along from an exact per-item count so callers see
    * the overestimate (est ≥ exact always — a unit-pinned invariant).
    * Keep items with est ≥ threshold: no false negatives (an item
    * with true count ≥ threshold always estimates ≥ threshold). */
  def countMinHeavyHitters(
      items: DataFrame, itemCol: String,
      depth: Int, width: Int, threshold: Long): DataFrame =
    probeHeavyHitters(countMinTable(items, itemCol, depth, width),
      items, itemCol, depth, width, threshold)

  /** Probe a prebuilt sketch table (the [[countMinTable]] layout —
    * possibly accumulated by a STREAMING aggregation whose state is
    * the cells) with the distinct items of `items`; same estimate /
    * threshold semantics as [[countMinHeavyHitters]]. */
  def probeHeavyHitters(
      sketch: DataFrame, items: DataFrame, itemCol: String,
      depth: Int, width: Int, threshold: Long): DataFrame = {
    val exact = items.filter(col(itemCol).isNotNull)
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("exact"))
    exact
      .select(col("item"), col("exact"),
        posexplode(cellBuckets(col("item"), depth, width)).as(Seq("row", "bucket")))
      // LEFT join + 0-fill: the sketch stores only NON-EMPTY cells, so
      // an item probing an absent cell has sketch estimate 0 for that
      // row — the old inner join dropped the row from the min instead,
      // letting an item absent from the sketch corpus inherit a hot
      // colliding cell's count as its estimate (review r6)
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("item", "exact")
      .agg(min("cnt").as("est"))
      .filter(col("est") >= threshold)
      .select(col("item"), col("est"), col("exact"))
  }
}
