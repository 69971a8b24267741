package graft.operators

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** The engine's signature operator: the point-in-time (as-of) join.
  *
  * Semantics (reference: pandas path file.py:86-213, SQL template
  * bigquery.py:554-698): for each entity-df row, attach the feature row
  * with the greatest event_ts <= entity_ts and — when ttl > 0 —
  * event_ts >= entity_ts - ttl, matching on all of the view's entity
  * join keys; ties on event_ts broken by max created_ts; unmatched
  * entity rows keep null features (left outer).
  *
  * Spark-first formulation, chosen for 100 TB scale:
  *
  *   1. Stamp the entity df with a synthetic row id (the BQ template's
  *      entity_row_unique_id CONCAT at bigquery.py:559-569 is a row
  *      fingerprint; a generated id is safe under duplicate entity rows).
  *   2. Compute the entity df's (min,max) event-ts once and prune the
  *      feature scan to [min - ttl, max] (O5, bigquery.py:418-437 +
  *      590-603). The filter lands in the parquet scan as a pushed
  *      predicate / row-group skip — at 100 TB this is the difference
  *      between scanning a week and scanning years.
  *   3. Equi-join on the entity keys with the per-row as-of range as a
  *      post-join predicate — Catalyst plans a hash/sort-merge join on
  *      the keys (NOT a theta join), with AQE free to broadcast the
  *      smaller side.
  *   4. Reduce candidates to the as-of row per entity row with
  *      groupBy(rowId).agg(max_by(features, orderKey)). max_by is a
  *      declarative aggregate with map-side partial aggregation — unlike
  *      the row_number() window used by the reference's SQL template,
  *      candidates collapse to one row per group *before* the shuffle,
  *      so a hot entity with 10^6 candidate rows ships one row.
  *   5. Left-join the winners back to the entity df by row id.
  *
  * Determinism: the reference is nondeterministic under duplicate
  * (entity, event_ts, created_ts) rows (BQ ANY_VALUE,
  * bigquery.py:645-660). We order by (event_ts, created_ts,
  * tieBreakCols...) — callers that need a total order pass a unique
  * tie-break column.
  */
object PointInTimeJoin {

  val DefaultEntityTsCol = "event_timestamp"

  /** One Duration → µs interval rendering for the whole as-of family
    * (backward TTL, forward horizon, nearest tolerance): microsecond
    * precision — TimestampType's own resolution — computed from
    * (seconds, nanos) directly, so it neither truncates sub-second
    * windows (the getSeconds bug, review r4) nor overflows the way
    * Duration.toNanos does at ~292 years; long microseconds carry to
    * ~292k years, beyond any meaningful window. */
  private[graft] def durationInterval(d: java.time.Duration): Column =
    expr(s"INTERVAL ${d.getSeconds * 1000000L + d.getNano / 1000L} MICROSECOND")

  /** One view's join spec, fully resolved (registry lookups done). */
  final case class ViewJoin(
      view: FeatureView,
      joinKeys: Seq[String],            // entity-df column names == feature-df column names
      features: Seq[String],            // feature columns to attach
      featureDf: DataFrame,             // source already read + field-mapped
      tieBreakCols: Seq[String] = Nil)  // extra deterministic ordering

  /** Multi-view PIT join (O2): sequentially enrich the entity df.
    * Reference loop: file.py:108-204 / CTE chain bigquery.py:686-697. */
  def join(
      entityDf: DataFrame,
      views: Seq[ViewJoin],
      entityTsCol: String = DefaultEntityTsCol,
      fullFeatureNames: Boolean = false): DataFrame = {
    require(entityDf.columns.contains(entityTsCol),
      s"entity df must contain timestamp column '$entityTsCol'")
    val missing = views.flatMap(_.joinKeys).distinct.filterNot(entityDf.columns.contains)
    require(missing.isEmpty,
      s"entity df is missing join key columns: ${missing.mkString(", ")}")
    // OUTPUT-name collisions fail loudly on every path (the reference
    // rejects them at ref resolution, feature_store.py:636-657): the
    // declarative join-back would otherwise emit DUPLICATE column names
    // and downstream selects die with AMBIGUOUS_REFERENCE far from the
    // cause. (Distinct from a view's SOURCE feature name matching an
    // entity column under fullFeatureNames=true — that is legal and
    // routes to the declarative path, which renames on output.)
    locally {
      var seen = entityDf.columns.toSet
      val clashes = views.flatMap { vj =>
        vj.features.map(f =>
          if (fullFeatureNames) s"${vj.view.name}__$f" else f).flatMap { o =>
          if (seen.contains(o)) Some(o) else { seen += o; None }
        }
      }
      require(clashes.isEmpty,
        s"output feature name(s) ${clashes.mkString(", ")} collide with an " +
          "entity column or another view's feature — set " +
          "fullFeatureNames=true or rename the feature")
    }
    // zero views = the input unchanged: the declarative path below
    // would otherwise stamp row ids, possibly localCheckpoint the whole
    // entity frame (an eager job, and the LogicalRDD swap loses source
    // pushdown), and run the bounds job — for a no-op (review r12)
    if (views.isEmpty) return entityDf

    // All views on TimestampType columns with collision-free feature
    // names: CHAIN full-width sort-merge as-of merges ([[graft.plans
    // .AsOfJoin]]) — entity asof view1 asof view2 … — with no row-id
    // stamp, no candidate rows, and no winners join-back. Shuffle
    // accounting per view: the chain exchanges the accumulated frame
    // once and the feature table once; the winner-subtree alternative
    // below exchanges a narrow entity projection AND the feature table
    // AND — for the join-back — the accumulated frame and the winners
    // (both entity-cardinality) on rowId. The chain strictly moves
    // fewer bytes at every scale, needs no monotonically_increasing_id
    // pinning (acc flows linearly through one plan — no cross-branch
    // id-identity hazard, no localCheckpoint job), and the whole chain
    // is one STATIC plan (exchanges dictated by
    // requiredChildDistribution — nothing for AQE to re-plan). Since r8
    // the exec's right-side ordering carries the feature payload
    // suffix, so it reproduces the declarative max_by(payload,
    // struct(ordCols, payload)) total order exactly — including on
    // fully-duplicate (key, ts, created, tiebreak) rows — and no
    // tie-break/uniqueness precondition gates this route. The
    // declarative winner-subtree path remains for non-timestamp ts
    // columns and feature-name collisions.
    val chainOutName: ViewJoin => String => String =
      vj => f => if (fullFeatureNames) s"${vj.view.name}__$f" else f
    val chainable = views.nonEmpty && {
      var cols = entityDf.columns.toSet
      views.forall { vj =>
        val outNames = vj.features.map(chainOutName(vj))
        val ok = sortMergeEligible(entityDf, vj, entityTsCol) &&
          vj.features.forall(!cols.contains(_)) &&
          outNames.forall(!cols.contains(_))
        cols ++= outNames
        ok
      }
    }
    // Route decision, made ONCE from the ORIGINAL entity frame and held
    // for every view: the as-of output is row-for-row the entity frame,
    // so if the entity fits the broadcast gate, so does every
    // accumulated intermediate — but the intermediates' own OPTIMIZER
    // stats (join-estimate inflated) would flip later links to
    // sortmerge mid-plan if re-consulted. One decision, one shape. The
    // right-side gate uses the LARGEST view source (pre-pruning — an
    // over-estimate, the safe direction: the broadcast route's win
    // scales with the feature shuffle it deletes).
    val strat =
      if (views.isEmpty) graft.plans.AsOfJoin.SortMerge
      else graft.plans.AsOfJoin.pinnedStrategy(entityDf.sparkSession).getOrElse {
        // stats only when the route is actually open: the maxBy runs the
        // optimizer over every view's source, wasted under a pinned
        // session (review r12)
        val biggest = views.map(_.featureDf).maxBy(
          _.queryExecution.optimizedPlan.stats.sizeInBytes)
        // the broadcast route ships each view's WINNERS (entity rows ×
        // that view's feature payload) — gate on the union of all
        // views' feature widths, the conservative bound (review r12);
        // each column rides with its source frame so variable-width
        // payloads can answer from footer actuals (review r13)
        val payload = views.flatMap(vj =>
          vj.features.map(f => (vj.featureDf, f)))
        graft.plans.AsOfJoin.chooseStrategy(entityDf, biggest, payload)
      }

    if (chainable && strat == graft.plans.AsOfJoin.SortMerge) {
      val (mn0, mx0) = entityBounds(entityDf, entityTsCol)
      return views.foldLeft(entityDf) { (acc, vj) =>
        val (feat, tsCol, createdCol) = prepareFeature(vj, mn0, mx0)
        val ord = (createdCol.toSeq ++ vj.tieBreakCols).distinct.filterNot(_ == tsCol)
        val joined = graft.plans.AsOfJoin.join(acc, feat, vj.joinKeys,
          entityTsCol, tsCol, vj.view.ttl, ord, vj.features,
          strategy = graft.plans.AsOfJoin.SortMerge)
        joined.select(acc.columns.map(col).toIndexedSeq ++
          vj.features.map(f => col(f).as(chainOutName(vj)(f))): _*)
      }
    }

    val rowId = "__graft_row_id"
    // monotonically_increasing_id is evaluated independently in every plan
    // branch that references it; if the entity df's plan can produce rows
    // in a different order across re-executions (any shuffle's reduce-side
    // arrival order, round-robin repartition, limit, sample, or a
    // nondeterministic expression) the candidate projection and the final
    // join-back could disagree on ids. localCheckpoint pins the ids once —
    // both branches read the same materialized blocks. For the common
    // replay-stable shape (file/local scan + filter + project + union) the
    // ids are already reproducible and the materialization is skipped.
    val stampedRaw = entityDf.withColumn(rowId, monotonically_increasing_id())
    val stamped =
      if (needsRowIdPinning(entityDf)) stampedRaw.localCheckpoint()
      else stampedRaw

    // O5 bounds (bigquery.py:418-437): computed ONCE from the entity df —
    // they are over entityTsCol, which is invariant across the fold;
    // each view's scan filter derives from these literals. Metadata-only
    // (parquet footer stats) when the plan allows, else one tiny agg
    // over the checkpointed blocks.
    val (mnTs, mxTs) = entityBounds(stamped, entityTsCol)

    // Each view's as-of winners are computed from the CHECKPOINTED
    // entity df directly — never from the accumulated join chain. The
    // narrow candidate projection (rowId, ts, keys) is invariant across
    // views, so the per-view subtrees are independent: Spark schedules
    // their candidate joins as parallel stages, and view N's plan does
    // not re-traverse views 1..N-1's join-backs.
    val enriched = views.foldLeft(stamped) { (acc, vj) =>
      val w = viewWinners(stamped, vj, entityTsCol, rowId, fullFeatureNames,
        mnTs, mxTs, strat)
      // winners are entity-cardinality: under the broadcast route the
      // join-backs are hinted broadcast hash joins, so the whole
      // enrichment is ONE codegen pipeline over the stamped frame —
      // scan → BHJ(w1) → BHJ(w2) → … with zero exchanges
      acc.join(
        if (strat == graft.plans.AsOfJoin.Broadcast) broadcast(w) else w,
        Seq(rowId), "left")
    }
    val result = enriched.drop(rowId)
    // the all-eligible broadcast shape is as static as the chain (every
    // join hinted, the only exchanges are the tiny per-view winner
    // reductions): engine-owned AQE policy applies (StaticPlan)
    if (chainable && strat == graft.plans.AsOfJoin.Broadcast)
      graft.plans.StaticPlan.applyPolicy(result)
    else result
  }

  /** Entity-df (min, max) event-ts for the O5 pruning window:
    * metadata-only from parquet footer statistics when the entity plan
    * is a projection over a parquet relation whose ts column traces to
    * a physical column ([[graft.sources.FooterBounds]] — zero Spark
    * jobs, and at 100 TB a footer read per file instead of a ts-column
    * scan), else the tiny min/max aggregation job. The footer variant
    * may be a SUPERSET of the true bounds (filters are traced through,
    * not applied) — safe because the window only prunes candidates the
    * per-row as-of predicate would reject anyway. */
  private[operators] def entityBounds(
      entity: DataFrame, entityTsCol: String): (java.sql.Timestamp, java.sql.Timestamp) = {
    // non-TimestampType entity ts (DATE / NTZ / epoch longs — the exact
    // types the declarative fallback route exists for) skips the prune
    // window instead of crashing: getTimestamp on a Date/LocalDateTime
    // min/max threw ClassCastException before the join was even built,
    // and a Timestamp-literal filter against a non-timestamp feature ts
    // would be type-unsound anyway. Null bounds = no pruning — the
    // window is an optimization, superset-correct by contract
    // (review r12).
    if (entity.schema(entityTsCol).dataType !=
      org.apache.spark.sql.types.TimestampType) (null, null)
    else graft.sources.FooterBounds.tsBounds(entity, entityTsCol).getOrElse {
      val Array(b) = entity.agg(
        min(col(entityTsCol)).as("mn"), max(col(entityTsCol)).as("mx")).collect()
      (b.getTimestamp(0), b.getTimestamp(1))
    }
  }

  /** True when the entity df's plan could yield a different row order on
    * re-execution, making monotonically_increasing_id unstable across
    * plan branches. Conservative whitelist: only scans, filters,
    * projections, unions, and aliases with deterministic expressions are
    * replay-stable (parquet split order and per-branch row order are
    * reproducible); anything else — aggregates, joins, windows,
    * repartitions, limits, samples — pins via localCheckpoint. */
  private[graft] def needsRowIdPinning(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    val plan = df.queryExecution.analyzed
    val stableShape = plan.collect { case n => n }.forall {
      case _: Project | _: Filter | _: Union | _: SubqueryAlias | _: LocalRelation => true
      // only FILE-backed leaves are replay-stable: split order and
      // per-split row order reproduce across executions. A JDBC or
      // other external relation can legally return rows in any order
      // per scan — those must pin.
      case lr: LogicalRelation => lr.relation.isInstanceOf[HadoopFsRelation]
      case v2: DataSourceV2Relation =>
        v2.table.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileTable]
      case _ => false
    }
    val deterministic = !plan.exists(_.expressions.exists(e => e.exists(!_.deterministic)))
    !(stableShape && deterministic)
  }

  /** True when a view's winner computation can run on the custom
    * sort-merge as-of plan: both timestamps are real TimestampType.
    * No tie-break precondition since r8 — the exec sorts the right side
    * by (keys, ts, ordCols, payload), the same total order the
    * declarative max_by maximizes, so residual ties resolve identically
    * on both paths. (Unorderable feature types — maps — would fail the
    * exec's required sort, but they fail the declarative max_by's
    * struct ordering the same way, so orderability is not a routing
    * criterion.) */
  private def sortMergeEligible(
      entity: DataFrame, vj: ViewJoin, entityTsCol: String): Boolean = {
    import org.apache.spark.sql.types.TimestampType
    val tsCol = vj.view.batchSource.eventTimestampColumn
    entity.schema(entityTsCol).dataType == TimestampType &&
      vj.featureDf.columns.contains(tsCol) &&
      vj.featureDf.schema(tsCol).dataType == TimestampType &&
      // join-key TYPE parity is an exec precondition (AsOfJoin.join
      // fails loudly on e.g. int-vs-bigint keys, whose hash
      // co-partitioning would otherwise silently miss every match);
      // the declarative fallback plans the same keys through <=> with
      // an implicit cast — so a mismatch is a ROUTING criterion, not
      // an error
      vj.joinKeys.forall(k => vj.featureDf.columns.contains(k) &&
        entity.schema(k).dataType == vj.featureDf.schema(k).dataType)
  }

  /** Shared feature-side preparation (O5): directory-level date-partition
    * pruning, the [mn − ttl, mx] scan filter pushed into parquet, and the
    * column-pruned selection. Returns (feat, tsCol, createdCol). */
  private def prepareFeature(
      vj: ViewJoin,
      mnTs: java.sql.Timestamp,
      mxTs: java.sql.Timestamp): (DataFrame, String, Option[String]) = {
    val tsCol = vj.view.batchSource.eventTimestampColumn
    val createdCol = vj.view.batchSource.createdTimestampColumn
    val ttl = vj.view.ttl
    val ordCols: Seq[String] = ((tsCol +: createdCol.toSeq) ++ vj.tieBreakCols).distinct
    val featCols: Seq[String] = (vj.joinKeys ++ ordCols ++ vj.features).distinct
    val lowerTs: Option[java.sql.Timestamp] =
      if (!ttl.isZero && mnTs != null)
        Some(java.sql.Timestamp.from(mnTs.toInstant.minus(ttl)))
      else None
    // Directory-level pruning first (O5 + date_partition_column,
    // data_source.py:295-306): the date filter prunes partitions, the ts
    // filter then skips row groups within the surviving files.
    val pruned = graft.sources.DatePartition.prune(
      vj.featureDf, vj.view.batchSource.datePartitionColumn, lowerTs, Option(mxTs))
    var feat = pruned.select(featCols.map(col): _*)
    if (mxTs != null) {
      feat = feat.filter(col(tsCol) <= lit(mxTs))
      lowerTs.foreach(l => feat = feat.filter(col(tsCol) >= lit(l)))
    }
    (feat, tsCol, createdCol)
  }

  /** One view's as-of winners keyed by row id (O1/O4/O5/O6): the caller
    * left-joins the result back to the accumulated frame. */
  private def viewWinners(
      stamped: DataFrame,
      vj: ViewJoin,
      entityTsCol: String,
      rowId: String,
      fullFeatureNames: Boolean,
      mnTs: java.sql.Timestamp,
      mxTs: java.sql.Timestamp,
      strat: String = graft.plans.AsOfJoin.SortMerge): DataFrame = {
    val ViewJoin(view, joinKeys, features, _, tieBreaks) = vj
    val ttl = view.ttl
    val (featPrepared, tsCol, createdCol) = prepareFeature(vj, mnTs, mxTs)
    val outName: String => String =
      f => if (fullFeatureNames) s"${view.name}__$f" else f

    // Eligible views ride an as-of winner computation on the NARROW
    // (rowId, ts, keys) entity projection: no candidate rows shuffle,
    // and the winners join back by rowId exactly like the declarative
    // branch (unmatched rows carry nulls, which the left join-back
    // preserves identically). Route by the held strategy: broadcast
    // (feature scan never exchanged or sorted — see
    // AsOfJoin.broadcastWinners) or the sort-merge exec.
    if (sortMergeEligible(stamped, vj, entityTsCol) &&
        features.intersect((rowId +: entityTsCol +: joinKeys).distinct).isEmpty) {
      val leftNarrow =
        stamped.select((rowId +: entityTsCol +: joinKeys).distinct.map(col): _*)
      val ord = (createdCol.toSeq ++ tieBreaks).distinct.filterNot(_ == tsCol)
      if (strat == graft.plans.AsOfJoin.Broadcast)
        return graft.plans.AsOfJoin.broadcastWinners(leftNarrow, featPrepared,
          joinKeys, entityTsCol, tsCol, ttl, ord, features, rowId, outName)
      // join0: the winner frame is a SUBTREE of the outer enrichment —
      // the OUTER join() owns the AQE policy for the final frame
      // (review r12)
      val out = graft.plans.AsOfJoin.join0(leftNarrow, featPrepared, joinKeys,
        entityTsCol, tsCol, ttl, ord, features,
        strategy = graft.plans.AsOfJoin.SortMerge)
      return out.select(col(rowId) +: features.map(f => col(f).as(outName(f))): _*)
    }

    // Candidate generation only needs (rowId, keys, ts) — shuffle the
    // narrow projection, not the whole entity row. Alias both sides so
    // self-joins (entity df built from the feature table itself)
    // resolve unambiguously.
    val left = stamped.select((rowId +: entityTsCol +: joinKeys).distinct.map(col): _*).alias("__l")
    def L(c: String): Column = col(s"__l.$c")
    def R(c: String): Column = col(s"__r.$c")

    val ordCols: Seq[String] = ((tsCol +: createdCol.toSeq) ++ tieBreaks).distinct
    // NOTE (measured twice, rounds 3+4): do NOT rebalance() either join
    // side here. The single-row-group test files do serialize the
    // candidate join into one ~1.4 s task, but inserting a round-robin
    // exchange costs MORE (+1.3-1.9 s/query) — an extra shuffle, a
    // broken scan→join codegen pipeline, and an extra AQE replan per
    // view. On a production many-file table the scan parallelizes by
    // itself; the single-task stage is a toy-data artifact, not a plan
    // defect.
    val featAliased = featPrepared.alias("__r")

    // Per-row as-of predicate (inclusive on both edges — the reference's
    // SQL semantics, bigquery.py:613-617).
    val asOf: Column = {
      val upper = R(tsCol) <= L(entityTsCol)
      if (ttl.isZero) upper
      // micros, not whole seconds: a sub-second TTL must bound the
      // window identically here and on the sort-merge path (which
      // compares raw micros), or the two paths disagree on winners
      else upper && R(tsCol) >= (L(entityTsCol) - durationInterval(ttl))
    }
    val keyCond = joinKeys.map(k => L(k) <=> R(k)).reduce(_ && _)
    // held broadcast route: hint the narrow entity side so the candidate
    // join is a build-on-entity BHJ (no feature-side exchange) even when
    // this view fell to the declarative branch
    val leftHinted =
      if (strat == graft.plans.AsOfJoin.Broadcast) broadcast(left) else left
    val candidates = leftHinted.join(featAliased, keyCond && asOf, "inner")

    // As-of winner per entity row: max_by over a lexicographic struct
    // (event_ts desc, created_ts desc, tiebreaks desc, then the feature
    // payload itself as a stable final tiebreak — the reference's
    // ANY_VALUE here is nondeterministic, bigquery.py:645-660; we pin
    // max-payload). Partial-agg friendly — no window, no second wide
    // shuffle.
    // payload = the feature columns ONLY: tsCol is the first ordCol, so
    // candidates tying on ordCols always tie on it too — a __feat_ts
    // member could never discriminate and was dead weight in every
    // map-side partial, and it made this total order STRUCTURALLY
    // different from the sort-merge exec's (ordCols, featureCols)
    // suffix for no reason (review r12). Kept only for the degenerate
    // zero-feature view, where struct() would be invalid.
    val payload =
      if (features.isEmpty) struct(R(tsCol).as("__feat_ts"))
      else struct(features.map(R): _*)
    val ordKey = struct((ordCols.map(R) :+ payload.as("__payload")): _*)
    val winners = candidates
      .groupBy(L(rowId).as(rowId))
      .agg(max_by(payload, ordKey).as("__w"))

    winners.select(
      (col(rowId) +: features.map(f => col(s"__w.$f").as(outName(f)))): _*)
  }
}
