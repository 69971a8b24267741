package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** STANDING broadcast-misplan tripwire (VERDICT r12 #2).
  *
  * Round 12's `tools/BroadcastAudit` sweep found the one systemic
  * 100 TB hazard class in the corpus operators: frames derived from a
  * compressed, column-pruned corpus scan (gram-grain aggregates,
  * exploded posting sides, doc-grain rebuilds carrying full text)
  * estimate 50–100× under their actuals and get ESTIMATE-ELECTED as
  * broadcast build sides — a driver-killing broadcast of corpus-scale
  * actuals. The fix (`Dedup.mergeUnlessTiny` pinning sort-merge on
  * every corpus-derived join side above a 1 MB input estimate) closed
  * it in all affected queries — but the audit was a manually-run tool,
  * so NOTHING enforced that the next corpus operator routes through it.
  *
  * This spec is the enforcement: it PLANS every corpus-routed query
  * against a 10× replica of the sf0.1 corpus tables — the scale where
  * the r12 misbroadcasts actually planned — and audits the physical
  * plan only (construction-time training jobs run for the tokenizer
  * trio, see the routed list) —
  * and fails on ANY broadcast build side whose subtree scans a corpus
  * table, except the explicit bounded-shape allowlist below.
  * Mutation-style red: drop `mergeUnlessTiny` from a routed call site
  * (or add a corpus operator without routing it) and the derived
  * frame's under-estimate re-elects the broadcast → this test fails;
  * green on the current tree.
  *
  * The replica is built once under /tmp and reused across runs
  * (idempotent on _SUCCESS, same builder as tools/ScaleCheck).
  */
class BroadcastTripwireSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(s)
    s
  }

  private val baseDir = "/root/testdata/sf0.1"
  private val corpusTables = Set("documents", "embeddings")

  /** The corpus-routed queries: everything whose join sides derive from
    * the documents/embeddings corpus. A NEW corpus operator belongs in
    * this list — and through `Dedup.mergeUnlessTiny` (or an equivalent
    * measured-bytes gate) on every corpus-derived join side. */
  private val routed = Seq(
    "q_novelty", "q_dup_span", "q_span_scrub",
    "q_dedup_minhash", "q_dedup_typo", "q_line_dedup",
    "q_dedup_containment", "q_containment_sweep",
    "q_semantic_dedup", "q_dedup_incremental_fuzzy",
    "q_contamination", "q_margin_mining",
    // r13 additions: the word-grain encode joins (word tables grow
    // with corpus vocabulary — routed, not broadcast), the unigram
    // trainer whose EM runs at vocabulary grain, and the span-corruption
    // projection (joinless today; listed so a future join side gets
    // coverage from day one). NOTE: the tokenizer trio RUNS its
    // bounded training jobs (word-freq aggs + vocab collects) at
    // construction time — the audited artifact is still only the PLAN,
    // but these three cost real 10x-replica jobs, deliberately: the
    // audit of the real query beats a cheaper proxy of it.
    "q_bpe_encode", "q_unigram_lm", "q_unigram_encode",
    "q_span_corruption",
    // r14: the PERSISTED encodes — their final plans carry the same
    // word-grain doc join (the artifact train happens at construction
    // against the replica, the staged model is fingerprint-cached
    // across runs of one build). q_unigram_lm_pruned is NOT listed:
    // train now returns a driver-local frame (bounded vocab), so its
    // plan has no join side to audit — the EM job shapes are covered
    // by q_unigram_lm/q_unigram_encode.
    "q_unigram_encode_persisted", "q_bpe_encode_persisted",
    // r14: chunk-grain CDC dedup — the shared-fingerprint side is
    // chunk-grain (corpus-scaling), routed through mergeUnlessTiny
    "q_cdc_dedup",
    // r16: the SQ8 two-stage chain (stage 2 broadcasts the candidate
    // set — bounded by construction at |Q|·R through the k-capped
    // heap + the bounded-batch gate; allowlisted below with that
    // proof) and the residual persisted probe (its only broadcast is
    // the driver-built nProbe-rows-per-query probe table — listed so
    // a future corpus-derived join side gets coverage from day one)
    "q_ann_sq8_rerank", "q_ann_ivfpq_residual",
    // r16: the OPQ∘residual composition — same staged-index probe
    // shape as q_ann_ivfpq_residual with the rotation expression in
    // front of corpus/query projections (a per-row map, no join) —
    // and the residual refine (probe + the |Q|·R-bounded exact fetch,
    // whose candidate broadcast is the literal-gate-proven allowlisted
    // shape, same as q_ann_ivfpq_rerank)
    "q_ann_opq_ivfpq_residual", "q_ann_ivfpq_residual_rerank")

  /** Bounded-shape allowlist: broadcast build sides that scan a corpus
    * table but are BOUNDED BY CONSTRUCTION, verified per shape.
    * q_dedup_typo broadcasts the distinct length-bucket id list —
    * bounded by the key-length domain, an aggregate (the Dedup.scala
    * editPairs Scaladoc's "only legitimate broadcast here"). */
  private def allowed(name: String, hit: graft.tools.BroadcastAudit.Hit): Boolean =
    name match {
      case "q_dedup_typo" =>
        hit.chain.contains("HashAggregate") && hit.scans == Seq("documents")
      case "q_ann_sq8_rerank" =>
        // stage-2's two FORCED broadcasts, both bounded by stage-1's
        // literal-path gate (|Q| <= 256): the query-vector fetch
        // (<= |Q| rows — a Filter straight over the corpus scan) and
        // the candidate set (<= |Q|·R rows — the k-capped heap's
        // output joined back to the broadcast query vectors, hence
        // the inner BroadcastHashJoin in its chain). An UNBOUNDED
        // batch takes the mergeUnlessTiny-gated plan with NO forced
        // broadcast — pinned by PipelineSpec's sq8 path-parity test,
        // whose audit of the distributed plan must come back empty.
        (hit.chain.startsWith("Project<-Filter<-Scan parquet") ||
          hit.chain.startsWith("Project<-BroadcastHashJoin")) &&
          hit.scans == Seq("embeddings")
      case "q_ann_ivfpq_residual_rerank" =>
        // the refine stage's two FORCED broadcasts, both bounded by
        // the residual probe's own literal-path cap (it ONLY serves
        // literal batches — over-cap callers are refused up front):
        // the candidate set (<= |Q|·R rows — the staged-index ADC
        // top-R joined to the broadcast query vectors, hence the
        // inner BroadcastHashJoin + the res-index scan in its chain)
        // and the query-vector fetch (<= |Q| rows — a Filter straight
        // over the corpus scan)
        (hit.chain.startsWith("Project<-BroadcastHashJoin") &&
          hit.scans.exists(_.startsWith("graft_ivfpq_res_index"))) ||
        (hit.chain.startsWith("Project<-Filter<-Scan parquet") &&
          hit.scans == Seq("embeddings"))
      case _ => false
    }

  test("no corpus-derived broadcast build side plans at 10x outside the allowlist") {
    val dir = s"/tmp/graft_tripwire10x_${baseDir.split('/').last}"
    graft.tools.ScaleCheck.buildScaled(spark, baseDir, dir, 10,
      "documents", Seq("doc_id"), textCols = Seq("text"))
    graft.tools.ScaleCheck.buildScaled(spark, baseDir, dir, 10,
      "embeddings", Seq("vec_id"))
    // precondition for the mutation-red property: the replica corpus
    // scan must estimate ABOVE mergeUnlessTiny's 1 MB bound, else a
    // dropped route would legitimately keep its toy-scale broadcast
    val docEst = spark.read.parquet(s"$dir/documents.parquet")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(docEst > BigInt(1L << 20),
      s"replica documents estimate $docEst must exceed the 1 MB route bound")
    val bad = routed.flatMap { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      graft.tools.BroadcastAudit.auditDf(df)
        .filter(h => h.nestedLoop || h.scansAnyOf(corpusTables))
        // a nested-loop whose build side is a GLOBAL aggregate is the
        // bounded scalar-attach class (totals/thresholds crossJoined
        // onto a frame — provably one row, not an estimate)
        .filterNot(h => h.nestedLoop && h.scalarBuild)
        .filterNot(h => !h.nestedLoop && allowed(name, h))
        .map(h => s"$name: $h")
    }
    assert(bad.isEmpty,
      s"corpus-derived broadcast build side(s) planned at 10x — route the " +
        s"derived frame through Dedup.mergeUnlessTiny or extend the " +
        s"bounded-shape allowlist with a proof:\n${bad.mkString("\n")}")
  }
}
