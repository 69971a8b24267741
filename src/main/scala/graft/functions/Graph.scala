package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analysis: fixed-iteration PageRank over an edge list —
  * the domain-authority signal a crawl→training-data pipeline uses to
  * weight sources (alongside the quality classifier and the per-domain
  * quota of [[Quota]]).
  *
  * Scale shape: the graph lives as a distributed edge DataFrame keyed
  * by src; every iteration is one src-keyed equi join (ranks × edges)
  * and one dst-keyed hash aggregation — the standard distributed
  * power-iteration, shuffling only node-sized frames (never edges × #
  * iterations, lineage is cut with localCheckpoint per step so the plan
  * stays O(1) per iteration instead of growing a join chain Catalyst
  * must re-analyze). Dangling mass (nodes with no outlinks) is a
  * one-row aggregate broadcast into the update, not a driver collect.
  *
  * Determinism contract (DuckDB oracle replay): ranks are rounded to
  * 12 decimals after every iteration, so the per-dst contribution sums
  * — the only aggregation-order-dependent arithmetic, with error
  * ~1e-16 at any realistic fan-in — feed the next step bit-identically
  * on both engines; the final projection rounds to 6.
  */
object Graph {

  /** PageRank after `iters` power iterations with damping `d`:
    *   r_0(v)     = 1/N
    *   r_{k+1}(v) = (1-d)/N + d·(Σ_{u→v} r_k(u)/outdeg(u) + dangling_k/N)
    * where dangling_k is the total rank parked on zero-outdegree nodes
    * (redistributed uniformly — the standard teleport treatment, so
    * Σ_v r(v) stays 1 every iteration).
    *
    * @param edges distinct directed edges; parallel duplicates should be
    *              deduped by the caller (they would double-count)
    * @return (node, rank) — rank rounded to 12 decimals; one row per
    *         node appearing as src or dst
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // the edge frame feeds every iteration: without the checkpoint the
    // caller's upstream derivation (scan + explode + distinct is the
    // common shape) re-executes per iteration's eager action
    // (review r6)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    // outdeg rides every iteration's join: worth one small checkpoint —
    // built lazily so iters = 0 doesn't pay an aggregation job for a
    // frame it never reads
    lazy val outDeg = e.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("__deg"))
      .localCheckpoint()

    var ranks = nodes.withColumn("__r", round(lit(1.0) / n, 12))
    for (_ <- 0 until iters) {
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      // one-row frame: total rank on dangling nodes this iteration
      val dangling = withDeg.filter(col("__deg").isNull)
        .agg(coalesce(round(sum(col("__r")), 12), lit(0.0)).as("__dm"))
      val contribs = withDeg.filter(col("__deg").isNotNull)
        .join(e, col("node") === col("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(round(sum(col("__r") / col("__deg")), 12).as("__c"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .withColumn("__r",
          round(lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) + col("__dm") / n), 12))
        .select("node", "__r")
        .localCheckpoint()
      // superseded round's blocks die here (strict release: the
      // iteration-0 frame merely WRAPS the shared nodes checkpoint and
      // is left alone — see Components.releaseCheckpoint)
      Components.releaseCheckpoint(ranks)
      ranks = next
    }
    val out = ranks.select(col("node"), col("__r").as("rank"))
    // with iters > 0 the result is its own checkpoint leaf — the
    // scaffolding checkpoints are dead and their executor blocks are
    // released (a long-lived session previously accumulated them per
    // call); at iters = 0 the result still READS nodes, so they stay
    if (iters > 0) {
      Components.releaseCheckpoint(e)
      Components.releaseCheckpoint(nodes)
      Components.releaseCheckpoint(outDeg)
    } else {
      // iters = 0: the result reads only the nodes checkpoint — the
      // edge blocks were materialized solely to derive it and leaked
      // per call in a long-lived session (review r12); outDeg is lazy
      // and was never built
      Components.releaseCheckpoint(e)
    }
    out
  }

  /** Synchronous label propagation (community detection, Raghavan et
    * al. 2007): every node starts labeled with its own id; each sweep
    * every node adopts the most frequent label among its UNDIRECTED
    * neighbors, ties broken to the SMALLEST label. The classic async
    * formulation updates in a random visit order — irreproducible by
    * construction; this synchronous min-tie-break variant is fully
    * deterministic, so the result is replayable and oracle-checkable.
    *
    * Scale shape mirrors [[pageRank]]: each sweep is one src-keyed
    * equi join (labels × edges) and one two-stage aggregation —
    * (node, label) counts partial-aggregate map-side, then one min_by
    * per node picks the mode — all node/edge-grain frames, lineage cut
    * per sweep. `iters` is FIXED (LPA converges in a handful of
    * sweeps); a driver-side convergence loop would make the job count
    * data-dependent, which a 100 TB scheduler budget can't accept.
    *
    * @return (node, community) — the label after `iters` sweeps; one
    *         row per node appearing as src or dst
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    // undirected: each edge messages both ways; dedup so parallel
    // edges don't double-vote
    val und = e
      .unionByName(e.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .filter(col("__src") =!= col("__dst"))
      .distinct()
      .localCheckpoint()
    // nodes derive from the RAW edge list, BEFORE the self-loop filter:
    // a node whose only edges are self-loops must still appear (with
    // community = its own label — it receives no messages), per the
    // 'one row per node appearing as src or dst' contract; deriving
    // from `und` silently dropped it (review r6)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct()
      .localCheckpoint()

    var labels = nodes.withColumn("__lbl", col("node"))
    for (_ <- 0 until iters) {
      val msgs = und
        .join(labels.withColumnRenamed("node", "__src"), Seq("__src"))
        .select(col("__dst").as("node"), col("__lbl"))
      // mode with deterministic ties: min over (-count, label)
      val winners = msgs
        .groupBy("node", "__lbl").agg(count(lit(1)).as("__n"))
        .groupBy("node")
        .agg(min_by(col("__lbl"),
          struct((-col("__n")).as("nc"), col("__lbl").as("lb"))).as("__new"))
      val next = labels
        .join(winners, Seq("node"), "left")
        .select(col("node"), coalesce(col("__new"), col("__lbl")).as("__lbl"))
        .localCheckpoint()
      Components.releaseCheckpoint(labels) // strict: sweep-0 wrapper is a no-op
      labels = next
    }
    val out = labels.select(col("node"), col("__lbl").as("community"))
    if (iters > 0) { // see pageRank: scaffolding checkpoints are dead now
      Components.releaseCheckpoint(und)
      Components.releaseCheckpoint(nodes)
    }
    out
  }
}
