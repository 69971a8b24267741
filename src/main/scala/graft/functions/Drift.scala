package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Feature-drift monitoring: population stability index (PSI) between a
  * BASELINE frame (training distribution) and a CURRENT frame (serving
  * logs) over a numeric column, optionally per group —
  *
  *   PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base)
  *
  * with FIXED driver-provided bin edges (the production contract: edges
  * are frozen with the model, so two runs are comparable) and Laplace
  * smoothing (+0.5 per bin) so empty bins stay finite. The usual
  * reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Scale shape: binning is the [[SearchSorted]] literal-bounds binary
  * search (a narrow codegen'd projection — no join against an edges
  * table), each side reduces to a (group, bin) count — map-side
  * combinable, output rows = groups × bins regardless of input size —
  * and everything after operates on that tiny frame (bounded windows
  * over ≤ #bins rows per group). Two scans total, nothing corpus-sized
  * shuffles.
  */
object Drift {

  /** Frozen-edge derivation: nBins−1 equi-depth edges from a BASELINE
    * frame via the mergeable approx_percentile sketch (one pass at any
    * scale). Compute ONCE when the model ships and pass to [[psi]] as
    * literals forever after — edges that move with the data make PSI
    * measure the edges, not the drift. Nulls excluded (the same policy
    * [[psi]] applies); duplicate quantiles collapse (heavily skewed
    * baselines yield fewer, wider bins). */
  def equiDepthEdges(
      baseline: DataFrame,
      valueCol: String,
      nBins: Int,
      accuracy: Int = 10000): Seq[Double] = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val row = baseline.filter(col(valueCol).isNotNull)
      .agg(percentile_approx(col(valueCol).try_cast("double"),
        typedlit(probs), lit(accuracy)).as("edges"))
      .head()
    // empty / all-null baselines aggregate to NULL — a clear error, not
    // the opaque NPE .getSeq(0).distinct produced (review r6)
    require(!row.isNullAt(0),
      s"equiDepthEdges: baseline has no non-null '$valueCol' values")
    row.getSeq[Double](0).distinct.sorted
  }

  /** Literal column addressing (the Quota.topKPerKey convention): a
    * bare col("geo.country") parses the dot as nested-field access and
    * misresolves any group column whose NAME contains a dot; backticks
    * quote it literally, embedded backticks doubled (review r12). */
  private def qcol(prefix: String, c: String): Column =
    col(s"$prefix.`${c.replace("`", "``")}`")
  private[functions] def gcol(c: String): Column =
    col(s"`${c.replace("`", "``")}`")

  /** Null-SAFE left equi-join keyed on `keys`: group columns can carry
    * null values, and Spark's `join(df, usingColumns)` never matches
    * them — the spine fill then silently zeroed the null group's real
    * counts (PSI = 0 for an arbitrarily drifted group; review r6).
    * Same trap Privacy.suppress documents; <=> is the fix. */
  private def joinNullSafeLeft(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame = {
    val lA = l.alias("__jl")
    val rA = r.alias("__jr")
    val cond = keys.map(k => qcol("__jl", k) <=> qcol("__jr", k)).reduce(_ && _)
    val rValueCols = r.columns.filterNot(keys.contains)
    lA.join(rA, cond, "left")
      .select(l.columns.map(c => qcol("__jl", c)).toIndexedSeq ++
        rValueCols.map(c => qcol("__jr", c)): _*)
  }

  def psi(
      baseline: DataFrame,
      current: DataFrame,
      valueCol: String,
      edges: Seq[Double],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(edges.nonEmpty, "psi needs at least one bin edge")
    // STRICTLY ascending: a duplicate edge creates a structurally
    // unreachable bin that still receives Laplace mass, biasing every
    // real bin's probability ([[equiDepthEdges]] dedups its own output;
    // manual edges must arrive clean — review r12)
    require(edges == edges.sorted && edges.distinct == edges,
      s"edges must be strictly ascending, got $edges")
    val nBins = edges.size + 1
    val gCols = groupCols.map(gcol)

    // null AND non-castable values are EXCLUDED (explicitly — the
    // filter is on the CAST, so a 'NA' string that casts to null is
    // dropped here rather than becoming a null bin the spine join
    // silently loses): PSI is a distribution measure over measurable
    // values — track null/dirty-rate drift with Validate / profile,
    // which count those first-class. [[ks]] applies the same policy so
    // the two numeric drift measures agree on which rows they see.
    def counted(df: DataFrame, out: String): DataFrame = df
      .filter(col(valueCol).try_cast("double").isNotNull)
      .select((gCols :+ SearchSorted.column(
        col(valueCol).try_cast("double"), DoubleType, edges.map(x => x: Any)).as("bin")): _*)
      .groupBy((gCols :+ col("bin")): _*)
      .agg(count(lit(1)).as(out))

    val b = counted(baseline, "n_base")
    val c = counted(current, "n_cur")
    // dense (group × bin) spine so both engines smooth over the SAME
    // bin set, including bins empty on one or both sides
    val groups =
      if (groupCols.isEmpty) baseline.sparkSession.range(1).select(lit(1).as("__g")).drop("__g")
      else b.select(gCols: _*).unionByName(c.select(gCols: _*)).distinct()
    val spine = groups.crossJoin(
      baseline.sparkSession.range(nBins).select(col("id").cast("int").as("bin")))
    val keys = groupCols :+ "bin"
    val filled = joinNullSafeLeft(joinNullSafeLeft(spine, b, keys), c, keys)
      .select((gCols :+ col("bin") :+
        coalesce(col("n_base"), lit(0L)).as("n_base") :+
        coalesce(col("n_cur"), lit(0L)).as("n_cur")): _*)

    psiFromCounts(filled, groupCols, nBins)
  }

  /** Categorical PSI: the drift measure over a CATEGORY column (event
    * types, countries, model versions) — each observed category is its
    * own bin, no edges. The bin spine is the union of categories seen
    * on either side (so a category that appears or disappears
    * contributes, via smoothing, instead of being dropped); nulls
    * become the "<null>" category — categorical drift DOES track null
    * shifts, unlike the numeric path, because here null is a value of
    * the feature, not an unmeasurable point. KNOWN COLLISION: a data
    * value that is literally the string "<null>" merges with the real
    * null population — if an upstream system stringifies its nulls,
    * map that marker to a distinct value before calling (review r12). */
  def categoricalPsi(
      baseline: DataFrame,
      current: DataFrame,
      catCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val gCols = groupCols.map(gcol)
    def counted(df: DataFrame, out: String): DataFrame = df
      .select((gCols :+ coalesce(col(catCol).cast("string"), lit("<null>")).as("bin")): _*)
      .groupBy((gCols :+ col("bin")): _*)
      .agg(count(lit(1)).as(out))
    // checkpointed at the tiny (group, category) grain: nBins needs an
    // action, and without the cut that action plus the join each
    // re-scanned baseline and current from scratch (review r6)
    val b = counted(baseline, "n_base").localCheckpoint()
    val c = counted(current, "n_cur").localCheckpoint()
    val cats = b.select(col("bin")).unionByName(c.select(col("bin"))).distinct()
    val nBins = cats.count().toInt // tiny: one row per category
    val groups =
      if (groupCols.isEmpty)
        baseline.sparkSession.range(1).select(lit(1).as("__g")).drop("__g")
      else b.select(gCols: _*).unionByName(c.select(gCols: _*)).distinct()
    val keys = groupCols :+ "bin"
    val filled = joinNullSafeLeft(joinNullSafeLeft(
        groups.crossJoin(broadcast(cats)), b, keys), c, keys)
      .select((gCols :+ col("bin") :+
        coalesce(col("n_base"), lit(0L)).as("n_base") :+
        coalesce(col("n_cur"), lit(0L)).as("n_cur")): _*)
    psiFromCounts(filled, groupCols, nBins)
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group:
    *
    *   KS = max_v |F_base(v) − F_cur(v)|
    *
    * the nonparametric companion to [[psi]] — no edges to freeze, no
    * smoothing constant, sensitive to any distributional difference.
    * Computed in INTEGER arithmetic: with per-value cumulative counts
    * cb, cc and totals n1, n2,
    *
    *   d_num = max |cb·n2 − cc·n1|,   KS = d_num / (n1·n2)
    *
    * so the statistic is bit-identical across engines (one final
    * division of exact integers; the count products stay within Long
    * for group counts up to ~3·10⁹ — beyond that pass `edges`, which
    * also bounds the counts).
    *
    * Scale shape: each side first reduces to (group, value) counts —
    * map-side combinable, so the windows below run over DISTINCT
    * values, not rows. For continuous columns at 100 TB that is still
    * corpus-sized: pass `edges` (e.g. [[equiDepthEdges]] at nBins ≫
    * the resolution you care about) and values collapse to bin ids
    * first — the result becomes the KS of the binned distributions,
    * exact for the bins, off from the raw KS by at most the probability
    * mass of one bin. The running-cumulative window then touches ≤
    * #bins rows per group. A group entirely absent from one side has
    * no defined statistic: its `ks` is NULL (not the raw 0/0 NaN,
    * whose representation differs across engines). */
  def ks(
      baseline: DataFrame,
      current: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil,
      edges: Option[Seq[Double]] = None): DataFrame = {
    // same strictness as [[psi]]'s edges: a duplicate edge is a
    // zero-width bin — psi rejects it, and accepting it here would
    // leave the two numeric drift measures with different
    // edge-validity policies (a duplicate silently creates an
    // unreachable bin value under SearchSorted)
    edges.foreach(e => require(e.nonEmpty && e == e.sorted && e.distinct == e,
      s"edges must be strictly ascending, got $e"))
    val gCols = groupCols.map(gcol)
    def counted(df: DataFrame, out: String): DataFrame = {
      val v = edges match {
        case Some(e) => SearchSorted.column(
          col(valueCol).try_cast("double"), DoubleType, e.map(x => x: Any)).cast("double")
        case None => col(valueCol).try_cast("double")
      }
      // cast-based filter, matching [[psi]]: a non-castable value must
      // be excluded on BOTH measures, not dropped by one (psi's spine
      // join) while the other ranks it as a smallest-value bucket
      df.filter(col(valueCol).try_cast("double").isNotNull)
        .select((gCols :+ v.as("__v")): _*)
        .groupBy((gCols :+ col("__v")): _*)
        .agg(count(lit(1)).as(out))
    }
    val keys = groupCols :+ "__v"
    // null-SAFE full outer (explicit <=>, keys coalesced from both
    // sides): the null-unsafe using-columns join never merged the null
    // group's sides, so identical distributions scored KS ≈ 1.0 there
    // (review r6)
    val bC = counted(baseline, "n_base").alias("__jl")
    val cC = counted(current, "n_cur").alias("__jr")
    val cond = keys.map(k => qcol("__jl", k) <=> qcol("__jr", k)).reduce(_ && _)
    val merged = bC.join(cC, cond, "full_outer")
      .select(keys.map(k => coalesce(qcol("__jl", k), qcol("__jr", k)).as(k)) :+
        coalesce(col(s"__jl.n_base"), lit(0L)).as("__nb") :+
        coalesce(col(s"__jr.n_cur"), lit(0L)).as("__nc"): _*)
    val w =
      if (groupCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(gCols: _*)
    val wOrd = w.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("__cb", sum(col("__nb")).over(wOrd))
      .withColumn("__cc", sum(col("__nc")).over(wOrd))
      .withColumn("__n1", sum(col("__nb")).over(w))
      .withColumn("__n2", sum(col("__nc")).over(w))
      .groupBy(gCols: _*)
      .agg(
        max(abs(col("__cb") * col("__n2") - col("__cc") * col("__n1"))).as("d_num"),
        max(col("__n1")).as("n_base"),
        max(col("__n2")).as("n_cur"))
      .withColumn("ks", when(col("n_base") > 0 && col("n_cur") > 0, round(
        col("d_num").cast("double") /
          (col("n_base").cast("double") * col("n_cur").cast("double")), 6)))
      .select((gCols :+ col("ks") :+ col("d_num") :+ col("n_base") :+ col("n_cur")): _*)
  }

  /** PSI over PRE-BINNED counts: `filled` must be the dense
    * (groupCols…, bin, n_base, n_cur) frame — every group × bin row
    * present, zeros filled. The single copy of the smoothing + Σ(Δp·ln)
    * contract, shared by [[psi]] and the streaming drift monitor
    * (whose bin counts come from a windowed streaming aggregation). */
  def psiFromCounts(filled: DataFrame, groupCols: Seq[String], nBins: Int): DataFrame = {
    val gCols = groupCols.map(gcol)
    val w =
      if (groupCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(gCols: _*)
    val pBase = (col("n_base") + lit(0.5)) /
      (sum(col("n_base")).over(w) + lit(0.5 * nBins))
    val pCur = (col("n_cur") + lit(0.5)) /
      (sum(col("n_cur")).over(w) + lit(0.5 * nBins))
    val term: Column = (pCur - pBase) * log(pCur / pBase)
    // a group absent from one side entirely has NO defined drift — the
    // smoothing would otherwise invent a uniform pseudo-distribution
    // for the missing side and can score a brand-new group "stable"
    // exactly where drift is maximal; psi goes null there, the same
    // policy [[ks]] applies to side-absent groups (review r12)
    filled
      .withColumn("__term", term)
      .groupBy(gCols: _*)
      .agg(sum(col("__term")).as("__psi"),
        sum(col("n_base")).as("n_base"),
        sum(col("n_cur")).as("n_cur"))
      .select((gCols :+
        when(col("n_base") > 0 && col("n_cur") > 0,
          round(col("__psi"), 6)).as("psi") :+
        col("n_base") :+ col("n_cur")): _*)
  }
}
