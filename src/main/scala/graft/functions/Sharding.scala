package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — deterministic key→shard
  * routing with minimal disruption under resharding (Thaler & Ravishankar
  * 1998, the scheme behind consistent cache/store routing): every (key,
  * shard) pair gets an independent salted-md5 score and the key lives on
  * the arg-max shard. Growing n shards to n+1 moves only the keys whose
  * NEW shard wins — expected 1/(n+1) of them — and every moved key moves
  * TO the new shard (unit-pinned), unlike mod-n routing where nearly all
  * keys reshuffle.
  *
  * The online-store relevance: [[graft.online.ParquetOnlineStore]]'s
  * bucket count is fixed per store; rendezvous routing is the documented
  * growth path for a sharded deployment — per-entity-key routing to store
  * shards that can be grown without a full re-materialize.
  *
  * Scale shape: a narrow per-row projection (n md5s per key, no shuffle,
  * no state); md5 keeps the decision cross-engine replayable, exactly
  * like [[Dedup.mixtureSample]].
  */
object Sharding {

  /** Arg-max-score shard for `keyCol` over shards 0..nShards-1. Scores
    * are the first 8 hex chars of md5("salt:shard:key"); ties (md5
    * prefix collisions — vanishingly rare) break toward the LARGER
    * shard id, matching an ORDER BY score DESC, shard DESC replay. */
  def rendezvousShard(keyCol: Column, nShards: Int, salt: String = "rdv"): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val scored = array((0 until nShards).map { s =>
      struct(
        substring(md5(concat(lit(s"$salt:$s:"), keyCol.cast("string")).cast("binary")), 1, 8)
          .as("score"),
        lit(s).as("shard"))
    }: _*)
    // a NULL key nulls every score; null struct fields sort FIRST, so
    // the arg-max would deterministically pile every null key onto
    // shard nShards-1 — a silent hotspot. A key that cannot be hashed
    // has no shard: emit NULL and let the caller decide (review r6).
    when(keyCol.isNull, lit(null).cast("int"))
      .otherwise(element_at(array_sort(scored), -1)("shard"))
  }

  /** Frame-level convenience: append `shard` for every row. Refuses a
    * frame that already carries one — withColumn would silently
    * REPLACE it, and the resharding-audit shape this exists for (old
    * routing vs new) would then compare the new column to itself. */
  def assignShards(
      df: DataFrame, keyCol: String, nShards: Int, salt: String = "rdv"): DataFrame = {
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — rename it first (e.g. to " +
        "shard_old) so old and new routing stay comparable")
    df.withColumn("shard", rendezvousShard(col(keyCol), nShards, salt))
  }
}
