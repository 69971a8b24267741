package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split cannot help (AQE only splits SORT-MERGE join
  * partitions, and only within one stage; a hot key that dominates a
  * stream-side hash join, or a deliberately co-partitioned pipeline,
  * still serializes on one task).
  *
  * Shape: the SKEWED side tags each row with a deterministic salt in
  * [0, saltFactor); the MODERATE side replicates every row once per
  * salt value. The join key becomes (keys…, salt), so a hot key's rows
  * spread across `saltFactor` reducers instead of one. Cost: the
  * moderate side shuffles saltFactor× its size — use for sides too big
  * to broadcast but far smaller than the skewed side (the dimension
  * join of a 100 TB event table against a 100 GB entity table with a
  * few celebrity keys).
  *
  * The salt must vary WITHIN a key (a key-derived hash would put the
  * whole hot key back on one reducer), so it hashes the full row.
  * Salt entropy is therefore bounded by the DISTINCT ROW COUNT inside
  * the hot key: a hot key whose rows take only a handful of distinct
  * values (heavily quantized value columns) spreads across only that
  * many of the saltFactor buckets while still paying full replication —
  * include a high-cardinality column (event id, timestamp) in the
  * frame, or don't salt such a join. Deterministic across retries and
  * plan re-executions — no rand(), so a recomputed partition lands in
  * the same bucket (rand() here corrupts join results under task
  * retry).
  *
  * Only inner and left joins are valid: replicating the right side
  * would duplicate right-outer unmatched rows. */
object SkewJoin {

  def salted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"salted join supports inner/left only (right replication would duplicate " +
        s"outer rows), got $joinType")
    // salt entropy from the HASHABLE left columns only: Spark refuses
    // xxhash64 over MapType (unordered — no canonical hash) and the
    // rejection is RECURSIVE — a map nested inside a struct or array
    // column fails analysis just like a top-level map (ADVICE r11; the
    // original fix filtered only top-level maps). An all-map frame
    // degrades to salt 0 (valid join, no spread) rather than failing.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case st: StructType => st.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
    val hashable = left.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    val salt =
      if (hashable.isEmpty) lit(0L)
      else pmod(xxhash64(hashable: _*), lit(saltFactor.toLong))
    val l = left.withColumn("__graft_salt", salt)
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    l.join(r, keys :+ "__graft_salt", joinType).drop("__graft_salt")
  }
}
