package graft.online

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.FeatureView

/** HRW-sharded composite online store (VERDICT r13 #6 — the growth
  * path [[graft.functions.Sharding.rendezvousShard]] documents, made
  * real): every entity key routes to one of N child stores by
  * rendezvous hashing over the key's CANONICAL serialization hex
  * ([[EntityKeyCodec.hexKey]] — the same bytes every other store path
  * hashes), writes fan out as N filtered upserts, point reads group
  * keys per shard and reassemble in request order.
  *
  * Why rendezvous and not mod-N: a [[ParquetOnlineStore]]'s bucket
  * count is fixed at table creation (rehashing misroutes), so the way
  * a deployment GROWS is by adding whole store shards. HRW moves only
  * the keys whose new shard wins — expected 1/(N+1) of them, every one
  * TO the new shard (unit-pinned in PureSpec, end-to-end pinned in
  * EngineSpec's grow test) — so a grow rebalances a sliver of the
  * store instead of re-materializing everything.
  *
  * Routing must agree BYTE-FOR-BYTE on three paths: the Spark write
  * path ([[shardCol]]: md5 over "salt:shard:hex" via
  * [[graft.functions.Sharding.rendezvousShard]]), the driver read
  * path ([[ShardedOnlineStore.shardOf]]: the same md5 in pure Scala),
  * and any oracle replay (DuckDB md5 — the q_shard_route contract).
  *
  * Scale shape: the shard column is a narrow per-row projection (N
  * md5s per row, no shuffle); each child upsert sees only its filtered
  * slice, so the composite adds zero exchanges beyond the children's
  * own. The incoming frame is persisted across the N filters so the
  * source is scanned once, not N times.
  *
  * Concurrency: each child keeps its own writer lease — two composite
  * upserts on the same view serialize per shard, and a reader never
  * sees a shard mid-swap beyond what the child already tolerates.
  */
class ShardedOnlineStore(
    val children: IndexedSeq[OnlineStore],
    salt: String = "rdv") extends OnlineStore {
  require(children.nonEmpty, "at least one shard required")

  private def n = children.size

  /** Pre-reduce if ANY child wants it: pre-reduction is correct for
    * every store (it is the LWW collapse itself), merely redundant for
    * children that reduce internally. */
  override def wantsPreReduced: Boolean = children.exists(_.wantsPreReduced)

  private[graft] def shardOf(key: Seq[(String, Any)]): Int =
    ShardedOnlineStore.shardOf(EntityKeyCodec.hexKey(key), n, salt)

  /** Spark-side shard id over the join keys — rendezvousShard over the
    * canonical-hex expression, the exact driver-formula twin. */
  private[graft] def shardCol(joinKeys: Seq[String]) =
    graft.functions.Sharding.rendezvousShard(
      EntityBucketExpr.keyHex(joinKeys), n, salt)

  def upsert(project: String, view: FeatureView, joinKeys: Seq[String],
      df: DataFrame, tsCol: String, createdCol: Option[String]): Unit = {
    if (n == 1) return children(0).upsert(project, view, joinKeys, df, tsCol, createdCol)
    val routed = df
      .select(OnlineStore.guardNullKeys(df.columns.toSeq, joinKeys, view.name): _*)
      .withColumn("__shard", shardCol(joinKeys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one pass discovers the touched shards, so an incremental batch
      // landing on a few shards never runs the other children's upsert
      // machinery (each child upsert is jobs + fs round trips)
      val touched = routed.select("__shard").distinct()
        .collect().map(_.getInt(0)).toSet
      touched.toSeq.sorted.foreach { s =>
        children(s).upsert(project, view, joinKeys,
          routed.filter(col("__shard") === s).drop("__shard"),
          tsCol, createdCol)
      }
    } finally routed.unpersist()
  }

  def read(project: String, view: FeatureView, joinKeys: Seq[String],
      entityKeys: Seq[Seq[(String, Any)]],
      features: Seq[String]): Seq[(Option[Timestamp], Map[String, FeatureValue])] = {
    // group per shard, one child multi-get each, reassemble in request
    // order — the request's Nth answer must be the Nth key's no matter
    // how keys interleave across shards
    val byShard = entityKeys.zipWithIndex.groupBy { case (k, _) => shardOf(k) }
    val out = new Array[(Option[Timestamp], Map[String, FeatureValue])](entityKeys.size)
    byShard.foreach { case (s, keyed) =>
      val answers = children(s).read(project, view, joinKeys, keyed.map(_._1), features)
      keyed.zip(answers).foreach { case ((_, i), a) => out(i) = a }
    }
    out.toIndexedSeq
  }

  override def delete(project: String, view: FeatureView, joinKeys: Seq[String],
      keysDf: DataFrame): Unit = {
    if (n == 1) return children(0).delete(project, view, joinKeys, keysDf)
    val routed = keysDf
      .select(OnlineStore.guardNullKeys(joinKeys, joinKeys, view.name): _*)
      .distinct()
      .withColumn("__shard", shardCol(joinKeys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = routed.select("__shard").distinct()
        .collect().map(_.getInt(0)).toSet
      touched.toSeq.sorted.foreach { s =>
        children(s).delete(project, view, joinKeys,
          routed.filter(col("__shard") === s).drop("__shard"))
      }
    } finally routed.unpersist()
  }

  def teardown(project: String, views: Seq[FeatureView]): Unit =
    children.foreach(_.teardown(project, views))

  /** TTL retention sweep fan-out — each parquet child expires its own
    * slice (the composite must not LOSE the sweep that bounds the
    * store, review r14); returns total expired rows. Parquet children
    * only, validated UP FRONT like [[rebalance]]. */
  def expire(spark: SparkSession, project: String, view: FeatureView,
      joinKeys: Seq[String], tsCol: String, cutoff: Timestamp): Long = {
    requireParquetChildren("expire")
    children.map(_.asInstanceOf[ParquetOnlineStore]
      .expire(spark, project, view, joinKeys, tsCol, cutoff)).sum
  }

  private def requireParquetChildren(op: String): Unit =
    children.find(!_.isInstanceOf[ParquetOnlineStore]).foreach { other =>
      throw new UnsupportedOperationException(
        s"$op requires ParquetOnlineStore children, got ${other.getClass.getSimpleName}")
    }

  /** One-time REBALANCE after the ring changed (grow-by-one is the
    * designed case): every parquet child's table is scanned once, rows
    * whose HRW target under THIS (grown) ring differs from the shard
    * they sit on are upserted into their target and deleted from the
    * source. By the HRW property a grow-by-one only moves ~1/(N+1) of
    * rows and every one lands on the NEW shard — the scan is the cost,
    * the movement is the sliver. Returns the number of moved rows.
    * Parquet children only (the one child kind with a table dump);
    * call per materialized view. */
  def rebalance(spark: SparkSession, project: String, view: FeatureView,
      joinKeys: Seq[String], tsCol: String, createdCol: Option[String]): Long = {
    // validate the WHOLE ring before any row moves: a lazy per-child
    // check threw mid-loop with the ring half-migrated and the moved
    // count lost (review r14)
    requireParquetChildren("rebalance")
    var moved = 0L
    children.zipWithIndex.foreach {
      case (child: ParquetOnlineStore, idx) =>
        val table =
          try child.tableDf(spark, project, view.name)
          catch { case _: org.apache.spark.sql.AnalysisException => null } // absent: nothing to move
        if (table != null) {
          val misplaced = table.withColumn("__shard", shardCol(joinKeys))
            .filter(col("__shard") =!= idx)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val byTarget = misplaced.select("__shard").distinct()
              .collect().map(_.getInt(0)).toSeq.sorted
            if (byTarget.nonEmpty) {
              moved += misplaced.count()
              byTarget.foreach { s =>
                children(s).upsert(project, view, joinKeys,
                  misplaced.filter(col("__shard") === s).drop("__shard"),
                  tsCol, createdCol)
              }
              child.delete(project, view, joinKeys,
                misplaced.select(joinKeys.map(col): _*))
            }
          } finally misplaced.unpersist()
        }
      case (other, _) =>
        throw new UnsupportedOperationException(
          s"rebalance requires ParquetOnlineStore children, got ${other.getClass.getSimpleName}")
    }
    moved
  }
}

object ShardedOnlineStore {
  // one digest per serving thread, reset per use — getInstance per
  // (key × shard) was a provider lookup + allocation on the point-read
  // routing path (review r14)
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Driver-side rendezvous shard — MUST stay the exact twin of
    * [[graft.functions.Sharding.rendezvousShard]] over the same hex
    * key (spec-pinned): score = first 8 hex chars of
    * md5("salt:shard:hex"), winner = max score, ties to the LARGER
    * shard id. */
  def shardOf(hexKey: String, nShards: Int, salt: String = "rdv"): Int = {
    require(nShards > 0)
    val digest = md5.get()
    var best = ""
    var win = -1
    var s = 0
    while (s < nShards) {
      digest.reset()
      val md = digest.digest(s"$salt:$s:$hexKey".getBytes("UTF-8"))
      val score = EntityKeyCodec.toHex(md).substring(0, 8)
      // >= : equal scores resolve to the larger shard id, matching the
      // Spark side's array_sort(score asc, shard asc) arg-max
      if (win < 0 || score >= best) { best = score; win = s }
      s += 1
    }
    win
  }
}
