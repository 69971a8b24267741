package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding LSH output)
  * into duplicate CLUSTERS so a dedup pipeline can keep one
  * representative per cluster. Pairs alone under-delete: a~b and b~c
  * must collapse {a,b,c} even when a~c was never emitted.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * standard shuffle-based formulation that converges in O(log² n)
  * rounds regardless of component diameter. A naive "propagate min
  * label to neighbors" loop needs DIAMETER rounds (a 10⁶-long chain of
  * near-dup docs → 10⁶ shuffles); star operations shortcut paths like
  * pointer jumping, so even pathological chains finish in tens of
  * rounds. Each round is two hash aggregations + two equi-joins on
  * node ids — partial-agg friendly, skew bounded by max degree, no
  * driver-side graph state. Per-round `localCheckpoint` truncates the
  * otherwise exponentially growing iterative lineage.
  *
  *   - large-star(n): connect every neighbor v > n to m = min(Γ(n)∪{n})
  *   - small-star(n): connect every neighbor v ≤ n (edges assigned to
  *     their larger endpoint) and n itself to m = min of those
  *
  * At the fixpoint the edge set is a star forest: every node points at
  * its component's minimum id.
  */
object Components {

  /** @return (id, component) for every node appearing in an edge, where
    *         `component` is the smallest node id in the component.
    *         Self-loops are dropped; isolated nodes (never in an edge)
    *         are absent — union them back with component = own id if
    *         the full vertex set is needed. */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 30): DataFrame = {
    // integral ids only, checked at plan time: the long cast would turn
    // string ids (doc hashes, URLs) into NULLs under non-ANSI — every
    // edge silently discarded, an EMPTY component map, and a dedup
    // pipeline that deletes nothing — or a runtime cast error under
    // ANSI. Callers with string ids hash them (xxhash64) first.
    Seq(srcCol, dstCol).foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val t = edges.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"connectedComponents needs integral node ids; '$c' is $t — " +
          "map string ids to longs (e.g. xxhash64) before calling")
    }
    var e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    // fixpoint signature: (edge count, order-independent hash XOR) —
    // xor never overflows (sum trips ANSI arithmetic checks) and xor
    // cancellation cannot hide a change between DISTINCT edge sets of
    // equal count except by a ~2⁻⁶⁴ collision. One extra aggregation
    // per round.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(e)
    var iter = 0
    var stable = false
    while (!stable && iter < maxIter) {
      // large-star: for every node (both edge directions), attach its
      // strictly-larger neighbors to the min of the closed neighborhood
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mnv"))
        .select(col("u"), least(col("mnv"), col("u")).as("m"))
      // m = min(Γ(u)∪{u}) <= u < v, so (m, v) is already canonical and
      // never a self-loop — the least/greatest + self-loop refilter the
      // paper's generic statement suggests is dead under this invariant
      // (the small-star grouping by the larger endpoint relies on it)
      val ls = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))
        .distinct()

      // small-star: edges live at their larger endpoint; attach all its
      // smaller neighbors (and itself) to their min
      val mins2 = ls.groupBy("v").agg(min("u").as("m"))
      val next = ls.join(mins2, "v")
        .where(col("u") =!= col("m"))
        .select(least(col("u"), col("m")).as("u"), greatest(col("u"), col("m")).as("v"))
        .union(mins2.select(col("m").as("u"), col("v")))
        .distinct()
        .localCheckpoint()

      val nextSig = signature(next)
      stable = nextSig == sig
      // the superseded round's localCheckpoint blocks are dead the
      // moment `next` is materialized (eager) — without the release a
      // 30-round run retains 30 MEMORY_AND_DISK copies of the edge set
      releaseCheckpoint(e)
      sig = nextSig
      e = next
      iter += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(expected O(log^2 n)); raise maxIter")

    e.select(col("v").as("id"), col("u").as("component"))
      .union(e.select(col("u").as("id"), col("u").as("component")))
      .distinct()
  }

  /** Release the cached blocks behind an EAGER localCheckpoint once the
    * frame is superseded. `Dataset.unpersist` only talks to the SQL
    * CacheManager; a localCheckpoint lives as RDD-level storage on the
    * LogicalRDD leaf, so that leaf's RDD is unpersisted directly.
    *
    * STRICT by design: only frames whose whole plan IS the checkpoint
    * leaf are released. A localCheckpoint's lineage is truncated, so
    * unpersisting one that other frames still reference (e.g. a
    * shared `nodes` table a derived frame's plan merely CONTAINS)
    * would make it unrecomputable — the strict match turns those
    * calls into no-ops instead of data loss. */
  private[functions] def releaseCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }
}
