package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. Designed for the 100 TB shape:
  *
  *  - exact dedup is one hash-groupBy (map-side combinable);
  *  - near-dup candidate generation is banded LSH — cost is
  *    O(|docs| × bands) exploded rows shuffled by (band, bucket), never
  *    the O(n²) all-pairs join;
  *  - exact verification runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup (hash-groupBy): keep the row with min tiebreak per
    * dedup-key value. Map-side combinable via min_by. */
  def exactDedup(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val cols = df.columns.toIndexedSeq
    val payload = struct(cols.map(col): _*)
    df.groupBy(key.as("__dedup_key"))
      .agg(min_by(payload, tieBreak).as("__w"))
      .select(cols.map(c => col(s"__w.$c")): _*)
  }

  /** k-minhash signature from an element-hash column: h_i = min over
    * elements of hash_i(elementHash). Native Catalyst expression — see
    * MinHashExpr for why the Column-HOF formulation is a scale trap
    * (O(k×bands) plan nodes -> >10 s of driver-side planning). */
  def minhashSignature(elemHashes: Column, k: Int): Column =
    MinHashExpr.signature(elemHashes, k)

  /** LSH band hashes of a minhash signature: `bands` hashes of `rowsPer`
    * consecutive signature entries. Two docs share a band hash iff their
    * signatures agree on that whole band. Produces EXACTLY the same
    * band values as the fused [[MinHashExpr.bandHashes]] (same xxhash64
    * fold), so band tables from the two public APIs are
    * interchangeable; a NULL signature (empty input) stays NULL —
    * xxhash64 would otherwise ignore the null slice and hash every
    * empty doc into one bucket per band. */
  def bandHashes(sig: Column, bands: Int, rowsPer: Int): Column =
    when(sig.isNull, lit(null))
      .otherwise(array((0 until bands).map { b =>
        // the band index is hashed as a LONG (xxhash64 hashes an int
        // literal through the 4-byte path, which would diverge from
        // the fused expression's 8-byte fold)
        xxhash64((slice(sig, b * rowsPer + 1, rowsPer) +: Seq(lit(b.toLong))): _*)
      }: _*))

  /** Edit-distance near-dup pairs over a short key string (title, name,
    * canonical URL, text prefix) — the record-linkage / typo modality:
    * MinHash catches token-level rewrites and SimHash distributed bit
    * drift, but a 1-character typo changes EVERY shingle containing it
    * while leaving edit distance at 1. Blocking: length buckets of
    * width maxEdits+1 — |len(a)−len(b)| ≤ maxEdits implies the buckets
    * differ by ≤ 1, so one side probes its own and both neighbor
    * buckets and a pair matches in EXACTLY one of the three (no dedup
    * pass needed); never an all-pairs product. Oversized buckets
    * (degenerate constant-length keys) are capped like the LSH
    * variants — and that cap is a REAL ceiling, not a corner case,
    * when every key has the same length (fixed-width prefixes, padded
    * codes): the single length bucket then holds the whole corpus and
    * the cap drops it wholesale past `maxBucketSize` rows — zero pairs,
    * silently. Length blocking simply carries no entropy there; the
    * exactness-preserving fix is PassJoin-style segment partitioning
    * (Li et al. 2011: split each key into maxEdits+1 segments, a pair
    * within maxEdits shares one segment as a substring within ±maxEdits
    * offset), the documented upgrade path if a constant-length-key
    * corpus at that scale materializes. Verification is the codegen'd
    * levenshtein built-in, definitionally identical in DuckDB, so the
    * operator is fully value-oracled.
    *
    * @return (id_a, id_b, dist) with id_a < id_b, dist <= maxEdits
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      maxEdits: Int = 2,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxEdits >= 1, s"maxEdits must be >= 1, got $maxEdits")
    val w = maxEdits + 1
    val keyed = rebalance(df)
      .select(col(idCol).as("id"), col(keyCol).as("key"))
      .filter(col("key").isNotNull)
      .withColumn("__b", floor(length(col("key")) / lit(w)).cast("long"))
    // cap degenerate buckets BEFORE the join (same policy as LSH): a
    // bucket holding half the corpus would quadratically explode one
    // reducer
    val sized = keyed.join(
      broadcast(keyed.groupBy("__b").agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize).select("__b")),
      "__b")
    val left = sized.select(col("__b"),
      col("id").as("id_a"), col("key").as("key_a"))
    val right = sized
      .select(explode(array(col("__b") - 1, col("__b"), col("__b") + 1)).as("__b"),
        col("id").as("id_b"), col("key").as("key_b"))
    // the exploded right side is 3× the corpus — routed, never an
    // estimate-elected broadcast build (the bucket-ID list above is the
    // only legitimate broadcast here: bounded by the key-length domain)
    left.join(mergeUnlessTiny(df)(right), "__b")
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("key_a")) - length(col("key_b"))) <= maxEdits)
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxEdits)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** Join-strategy router for corpus-derived frames (the
    * `tools/BroadcastAudit` find): size estimates below a projection,
    * explode, or aggregate are width-ratio extrapolations of COMPRESSED
    * scan bytes, so the static planner happily elects a corpus-scaling
    * frame — a gram-grain aggregate, an exploded posting side, a
    * doc-grain rebuild carrying full text — as a broadcast build side
    * whenever the source compresses well, and a broadcast build of
    * corpus-scale actuals kills the driver. The pre-derivation INPUT's
    * bytes are the reliable signal (file-scan grain, grows linearly
    * with the data): below the bound the toy-scale plan stands
    * (broadcast election included — the bench floors); above it the
    * derived frame pins sort-merge — skew-safe, spillable, never a
    * build side. The gate takes the MAX of the input's and the derived
    * frame's estimates (a caller may hand an already-aggregated input
    * whose own stats are post-agg guesses — q_line_dedup's page frames)
    * and bounds at 1 MB: a column-pruned scan of a well-compressed
    * corpus reports ~30% of file bytes, so a 4 MB bound left 10×
    * replicas electing corpus broadcasts. */
  private[graft] def mergeUnlessTiny(input: DataFrame)(derived: DataFrame): DataFrame = {
    val est = input.queryExecution.optimizedPlan.stats.sizeInBytes
      .max(derived.queryExecution.optimizedPlan.stats.sizeInBytes)
    if (est < BigInt(1L << 20)) derived else derived.hint("merge")
  }

  /** MinHash-LSH near-duplicate pairs with exact Jaccard verification.
    *
    * Pipeline: shingle → minhash(k) → band → explode(band, hash) →
    * bucket self-join (only within buckets; skew-guarded by
    * maxBucketSize) → distinct candidate pairs → exact Jaccard on the
    * shingle sets → threshold.
    *
    * @param df        input
    * @param idCol     unique doc id (orderable)
    * @param textCol   document text
    * @param shingleN  word-n-gram size
    * @param k         signature length (bands * rowsPerBand)
    * @param bands     LSH bands; P(candidate) = 1-(1-j^r)^b
    * @param threshold exact-Jaccard threshold for a reported pair
    * @param maxBucketSize drop degenerate buckets larger than this
    *                  (e.g. empty-text buckets) instead of exploding
    *                  into n² pairs
    * @return (id_a, id_b, jaccard) with id_a < id_b. Backed by a
    *         self-releasing shingle cache: consume with exactly ONE
    *         action (see [[unpersistAfterFirstUse]]) — extra probe
    *         actions stay correct but forfeit the cache.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")

    // (id, shingles) is consumed three times (banding + both sides of
    // the verification join) — persist the narrow projection instead of
    // re-shingling the corpus per branch. MEMORY_AND_DISK: spills, never
    // OOMs at scale.
    //
    // The persist boundary sits BELOW the size>0 filter on purpose: a
    // filter on a computed-heavy column would otherwise be predicate-
    // pushed through the repartition and union — with the whole
    // ngram/regex expression inlined into the pushed condition — and
    // evaluated per row on the narrow pre-shuffle partitions, then
    // recomputed again post-shuffle (measured 10x the honest cost).
    // Filtering above the cached relation blocks the sink.
    //
    // Cache lifetime is deterministic (ADVICE r2): the cache is dropped
    // as soon as the first action consuming the returned frame completes
    // (see unpersistAfterFirstUse) — a long-lived session running many
    // dedup passes no longer accumulates cached relations. Re-executing
    // the returned frame after that first action recomputes shingles.
    // __mh_call is a per-call tag literal: it makes each call's plan
    // distinct, so the consumption listener of one call can never match
    // (sameResult) a sibling call's identical pipeline and unpersist the
    // sibling's cache before its first use (review r3).
    // Shingles ride as xxhash64 LONGS from the start (the banding
    // hashed them anyway — this also deletes that re-hash): the cached
    // relation, the verify join payloads, and the Jaccard intersects
    // all carry 8 bytes per gram instead of the gram text, bounding the
    // decompressed-actual-vs-compressed-estimate blowup that makes
    // estimate-elected broadcasts of text frames dangerous. Exactness
    // is modulo xxhash64 collisions, the same contract the banding and
    // [[ngramContamination]] already carry.
    val shingleProj = rebalance(df)
      .withColumn("__words", TextFunctions.words(col(textCol)))
      .select(col(idCol).as("id"),
        transform(TextFunctions.wordNgramsFromWords(col("__words"), shingleN),
          e => xxhash64(e)).as("shingles"),
        lit(callSeq.incrementAndGet()).as("__mh_call"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shingled = shingleProj.filter(size(col("shingles")) > 0)

    val banded = shingled
      .select(col("id"), posexplode(MinHashExpr.bandHashes(col("shingles"), k, bands)))
      .toDF("id", "band", "bucket")

    // Candidates: ids sharing any (band, bucket). Self-join within
    // buckets only; cap bucket size to keep a degenerate bucket from
    // producing O(n^2) pairs. bounded_collect caps the aggregation
    // STATE, not just the output: a boilerplate flood sharing one
    // bucket costs O(cap) buffer per task, never the full bucket
    // (collect_list-then-filter built the whole list first — r6
    // verdict).
    val buckets = banded.groupBy("band", "bucket")
      .agg(BoundedCollect.column(col("id"), maxBucketSize).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    val pairs = buckets
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()

    // Exact verification on candidates only. The shingle sides are
    // corpus-scaling — routed, never an estimate-elected build side.
    val sh = shingled
    val route = mergeUnlessTiny(df) _
    val out = pairs
      .join(route(sh.select(col("id").as("id_a"), col("shingles").as("sh_a"))), "id_a")
      .join(route(sh.select(col("id").as("id_b"), col("shingles").as("sh_b"))), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    unpersistAfterFirstUse(out, shingleProj)
  }

  /** Cross-corpus MinHash near-dup: pair each BATCH document against
    * the CORPUS documents it near-duplicates — the fuzzy form of
    * incremental-ingestion dedup (the exact form anti-joins on content
    * fingerprints; this one catches edited re-crawls). Both sides are
    * banded; candidates come from a (band, bucket) equi-join of the
    * batch bands against the corpus bands — never a self-join and never
    * a batch×corpus product. Degenerate buckets (boilerplate) are
    * capped at `maxBucketSize` ids on EACH side — the per-bucket
    * candidate count is the corpus×batch product, so both factors need
    * the bound. At production scale the corpus's band table is the thing
    * a store would precompute and keep; here it derives from the frame.
    *
    * @return (corpus_id, batch_id, jaccard), exact-verified ≥ threshold.
    */
  def minhashCrossDupPairs(
      corpus: DataFrame, corpusId: String, corpusText: String,
      batch: DataFrame, batchId: String, batchText: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")

    // hashed-long shingles end to end (see the self-join variant)
    def shingleSide(df: DataFrame, id: String, text: String): DataFrame =
      rebalance(df)
        .withColumn("__words", TextFunctions.words(col(text)))
        .select(col(id).as("id"),
          transform(TextFunctions.wordNgramsFromWords(col("__words"), shingleN),
            e => xxhash64(e)).as("shingles"))
        .filter(size(col("shingles")) > 0)
    def bandSide(sh: DataFrame): DataFrame = sh
      .select(col("id"), posexplode(MinHashExpr.bandHashes(col("shingles"), k, bands)))
      .toDF("id", "band", "bucket")

    // corpus shingles feed banding AND verification — persist the
    // narrow projection (same policy + cache lifetime as the self-join
    // variant); the batch side is typically small and recomputes.
    val corpusSh = shingleSide(corpus, corpusId, corpusText)
      .withColumn("__mh_call", lit(callSeq.incrementAndGet()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchSh = shingleSide(batch, batchId, batchText)

    val corpusBands = bandSide(corpusSh)
    val batchBands = bandSide(batchSh).toDF("batch_id", "band", "bucket")
    // cap degenerate buckets on BOTH sides before the join: the
    // candidate count per (band, bucket) is corpus_n × batch_n, so a
    // boilerplate-heavy batch (the degenerate case the cap exists for)
    // can explode one bucket quadratically even when the corpus side is
    // bounded — capping only one factor leaves the product unbounded
    def keptBuckets(bands: DataFrame): DataFrame = bands
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize)
      .select("band", "bucket")
    // corpus-derived sides routed (see mergeUnlessTiny); batch-derived
    // sides routed against the batch input — small batches keep their
    // broadcast election, corpus-sized ones pin sort-merge
    val routeC = mergeUnlessTiny(corpus) _
    val routeB = mergeUnlessTiny(batch) _
    val candidates = batchBands
      .join(routeB(keptBuckets(batchBands)), Seq("band", "bucket"))
      .join(routeC(keptBuckets(corpusBands)), Seq("band", "bucket"))
      .join(routeC(corpusBands.toDF("corpus_id", "band", "bucket")), Seq("band", "bucket"))
      .select(col("corpus_id"), col("batch_id"))
      .distinct()

    val out = candidates
      .join(routeC(corpusSh.select(col("id").as("corpus_id"), col("shingles").as("sh_c"))), "corpus_id")
      .join(routeB(batchSh.select(col("id").as("batch_id"), col("shingles").as("sh_b"))), "batch_id")
      .withColumn("jaccard", jaccard(col("sh_c"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("batch_id"), col("jaccard"))
    unpersistAfterFirstUse(out, corpusSh)
  }

  /** Build the corpus's LSH band table as a PERSISTABLE artifact —
    * (id, band, bucket), one row per (document, band) — the thing a
    * production dedup store precomputes once per corpus version and
    * keeps, so incoming batches never re-shingle the corpus
    * ([[minhashSearchIndex]] is the query side). The mirror of
    * [[graft.functions.Similarity.ivfBuildIndex]]'s index-as-artifact
    * lifecycle: write it partitioned by band and a band-restricted probe
    * is a partition-pruned read. Size: |corpus| × bands rows of three
    * longs — ~1/1000th of a text corpus's bytes. */
  def minhashBuildIndex(
      corpus: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    rebalance(corpus)
      .withColumn("__words", TextFunctions.words(col(textCol)))
      .select(col(idCol).as("id"),
        TextFunctions.wordNgramsFromWords(col("__words"), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("__h", transform(col("shingles"), e => xxhash64(e)))
      .select(col("id"), posexplode(MinHashExpr.bandHashes(col("__h"), k, bands)))
      .toDF("id", "band", "bucket")
  }

  /** INCREMENTAL persisted-index lifecycle ([[minhashBuildIndex]] on
    * [[graft.sources.VersionedTable]]): commit a frame's band rows as a
    * new index version — `append = false` snapshots (first corpus
    * build), `append = true` adds ONLY this frame's bands to the
    * existing artifact (the daily-ingest shape: the corpus is never
    * re-shingled or re-banded; commit cost is O(batch)). Banding is
    * row-local, so init(corpus) + append(batch) is row-for-row
    * identical to build(corpus ∪ batch) — spec-pinned — and
    * VersionedTable's manifest claim makes the append atomic: a probe
    * pinned at the previous version never sees a half-written batch,
    * and a crashed append leaves an unreferenced staging dir (vacuumed
    * later), not a torn index. Rows are range-clustered by band so
    * band-restricted probes prune at row-group grain.
    * @return the committed index version */
  def minhashIndexCommit(
      dir: String, df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      append: Boolean = false): Int = {
    val rows = minhashBuildIndex(df, idCol, textCol, shingleN, k, bands)
      .repartitionByRange(col("band"))
      .sortWithinPartitions("band", "bucket")
    graft.sources.VersionedTable.commit(df.sparkSession, dir, rows, append = append)
  }

  /** Read a committed band index (head or a pinned version) —
    * the `index` input of [[minhashSearchIndex]]. */
  def minhashReadIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      version: Option[Int] = None): DataFrame =
    graft.sources.VersionedTable.read(spark, dir, version).select("id", "band", "bucket")

  /** Match a batch against a prebuilt corpus band table (the artifact of
    * [[minhashBuildIndex]], possibly round-tripped through parquet):
    * band the batch with the SAME (shingleN, k, bands), join on
    * (band, bucket) — capped on both sides like
    * [[minhashCrossDupPairs]] — then exact-verify candidates by Jaccard
    * on freshly computed shingles from both text frames. The corpus
    * frame is touched only for the candidate rows' shingles (a
    * candidate-sized join), never re-banded.
    *
    * @return (corpus_id, batch_id, jaccard), exact-verified >= threshold
    */
  def minhashSearchIndex(
      index: DataFrame,
      corpus: DataFrame, corpusId: String, corpusText: String,
      batch: DataFrame, batchId: String, batchText: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    val batchBands = minhashBuildIndex(batch, batchId, batchText, shingleN, k, bands)
      .toDF("batch_id", "band", "bucket")
    def keptBuckets(b: DataFrame): DataFrame = b
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize)
      .select("band", "bucket")
    val candidates = batchBands
      .join(keptBuckets(batchBands), Seq("band", "bucket"))
      .join(keptBuckets(index), Seq("band", "bucket"))
      .join(index.toDF("corpus_id", "band", "bucket"), Seq("band", "bucket"))
      .select(col("corpus_id"), col("batch_id"))
      .distinct()
    // hashed-long shingles for the verify payloads (see
    // minhashNearDupPairs); corpus/batch verify sides routed — a
    // corpus-scaling shingle frame must never be an estimate-elected
    // broadcast build side
    def shingled(df: DataFrame, id: String, text: String, outId: String, outSh: String) =
      df.withColumn("__words", TextFunctions.words(col(text)))
        .select(col(id).as(outId),
          transform(TextFunctions.wordNgramsFromWords(col("__words"), shingleN),
            e => xxhash64(e)).as(outSh))
    candidates
      .join(mergeUnlessTiny(corpus)(
        shingled(corpus, corpusId, corpusText, "corpus_id", "sh_c")), "corpus_id")
      .join(mergeUnlessTiny(batch)(
        shingled(batch, batchId, batchText, "batch_id", "sh_b")), "batch_id")
      .withColumn("jaccard", jaccard(col("sh_c"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("batch_id"), col("jaccard"))
  }

  private val callSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Deterministic cache lifetime for an intermediate persist feeding a
    * returned lazy frame: drop `cached` as soon as the first action that
    * consumes `result` completes (success OR failure), via a
    * self-unregistering QueryExecutionListener. Keeps the public API
    * lazy (plans stay inspectable) while bounding the cache's life to
    * one consumption — the intended use of these operators. If the
    * result is never executed, the persist stays unmaterialized (a
    * CacheManager entry with no blocks), and the listener expires after
    * `maxMissedQueries` unrelated queries so an abandoned frame cannot
    * leave a per-query plan-scan behind for the session's lifetime.
    *
    * CONTRACT: consume the returned frame with exactly ONE action
    * (collect / write / count). ANY completed action whose plan
    * contains the result counts as the first use — a cheap probe like
    * `isEmpty` or `limit(1).collect()`, or a `count()` before the real
    * `collect()`, drops the cache early and the next action recomputes
    * the cached subtree from scratch (correct results, up to ~10x
    * slower — the recompute the persist exists to avoid). Multi-action
    * consumers should `.persist()` the returned frame themselves first,
    * or run their probes after the main consumption. */
  private[functions] def unpersistAfterFirstUse(result: DataFrame, cached: DataFrame,
      maxMissedQueries: Int = 512): DataFrame = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private val missed = new java.util.concurrent.atomic.AtomicInteger(0)
      private def consume(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(p => (p eq target) || p.sameResult(target))
          catch { case _: Throwable => false }
        if ((hit || missed.incrementAndGet() > maxMissedQueries) &&
            done.compareAndSet(false, true)) {
          cached.unpersist()
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        consume(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
        consume(qe)
    }
    spark.listenerManager.register(listener)
    result
  }

  /** Hash/shingle work is CPU-bound per row; when the source collapses
    * to fewer partitions than cores (one small parquet file -> one
    * partition -> one busy thread), spread it. A narrow projection's
    * shuffle cost is trivial next to the per-row compute it unblocks;
    * on a many-file 100 TB table this is a no-op.
    *
    * The partition-count estimate comes from logical-plan size stats
    * (bytes / maxPartitionBytes), not `df.rdd.getNumPartitions` — the
    * latter forces physical planning + RDD DAG creation of the subtree
    * just to read a number. */
  private[graft] def rebalance(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxPartBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // statless plans (RDD-backed lineage) report defaultSizeInBytes =
    // Long.MaxValue — falling through would skip the rebalance exactly
    // when a 1-partition RDD needs it most; pay the physical-planning
    // cost of a real partition count instead
    val estParts =
      if (sizeBytes >= BigInt(Long.MaxValue)) df.rdd.getNumPartitions.toLong
      else (sizeBytes / maxPartBytes).toLong + 1
    if (estParts >= math.max(2, cores / 2)) return df
    // Mis-partitioned (few fat partitions): spread — but SIZE the target
    // to the data, not blindly to core count. Per-task floor ~64 KB of
    // text: the per-row regex/hash work at ~1 MB/s/core makes that a
    // ~60 ms task, comfortably above the ~5-10 ms dispatch cost a task
    // must amortize; a 600 KB corpus split 32 ways would pay more in
    // scheduling than it buys in parallelism (measured: most bench-sf
    // job wall was pure task dispatch). Capped at core count — at real
    // scale estParts is large and this branch never runs.
    val bytes =
      if (sizeBytes >= BigInt(Long.MaxValue)) BigInt(64L << 10) * cores
      else sizeBytes
    val target = math.max(1, math.min(cores.toLong,
      (bytes / (64L << 10)).toLong + 1).toInt)
    df.repartition(target)
  }

  /** Global line-level deduplication — the C4/RefinedWeb "drop any line
    * repeated elsewhere in the corpus" pass that strips boilerplate
    * (nav bars, cookie banners, license blocks) cross-document, where
    * per-document dedup cannot see it. Each distinct line survives only
    * at its FIRST occurrence, ordered by (docId, line index); documents
    * are reassembled from their surviving lines in order.
    *
    * Scale shape: explode to one row per line; the per-distinct-line
    * winner is a `min_by` hash aggregation keyed on the 16-byte line
    * fingerprint — map-side combinable, so the shuffle carries one
    * candidate per (line, map task), and the winner rows ARE the kept
    * lines (no join back against the corpus). Reassembly is a second
    * hash aggregation keyed on docId. No window over the corpus, no
    * global sort; a line duplicated 10⁹ times still ships one candidate
    * per map task. The final left join only re-attaches each document's
    * original line count.
    *
    * Whitespace-only lines are STRUCTURE, not content — they pass
    * through undeduplicated (a blank paragraph separator is the most
    * frequent "line" in real text; deduping it would strip the blank
    * line from every document but the globally first and silently
    * reflow the whole corpus — review r4). "Whitespace-only" is the
    * explicit class [ \t\r]* (a line cannot contain \n), stated as the
    * same character class in the engine and any SQL replay — `trim`
    * would be spaces-only and `\s` differs between regex dialects.
    *
    * @return (idCol, n_lines, n_kept, cleaned) — one row per input row;
    *         n_kept counts surviving lines including passed-through
    *         blanks; a document whose every line lost is kept with
    *         n_kept = 0 and cleaned = "". */
  def lineDedupGlobal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")))
    val isBlank = col("__line").rlike("^[ \\t\\r]*$")
    // md5 keyed (not raw text): the first shuffle carries 16-byte keys +
    // one winner payload per map task. A corpus-scale md5 collision
    // (~2⁻⁶⁴ at 10¹² lines) would merge two distinct lines' winners.
    val winners = lines.filter(!isBlank)
      .groupBy(md5(col("__line").cast("binary")).as("__lfp"))
      .agg(min_by(struct(col("__id"), col("__idx"), col("__line")),
        struct(col("__id"), col("__idx"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.__idx").as("__idx"),
        col("__w.__line").as("__line"))
    val kept = winners.unionByName(lines.filter(isBlank))
    val reassembled = kept
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__idx").as("i"),
            col("__line").as("l")))), x => x.getField("l")),
          "\n").as("cleaned"))
    // null text explodes to zero line rows, so its counters must land at
    // 0 like the other two columns — an uncoalesced size(split(null))
    // would emit n_lines = null against n_kept = 0, breaking the
    // "one counting row per input row" contract
    df.select(col(idCol),
        coalesce(size(split(col(textCol), "\n")).cast("long"), lit(0L)).as("n_lines"))
      // reassembled is doc-grain WITH the full cleaned text — routed,
      // never an estimate-elected broadcast build side
      .join(mergeUnlessTiny(df)(reassembled.withColumnRenamed("__id", idCol)),
        Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Train/eval contamination detection: corpus documents sharing at
    * least `minShared` word-n-grams with any eval document. The classic
    * benchmark-decontamination shape (13-gram collision): explode each
    * side to (gram, id), equi-join on the gram hash — a shuffle join on
    * gram hashes, never a document cross join.
    *
    * The eval side is broadcast only when its INPUT is provably small
    * (plan-stat bytes under a conservative bound) or the caller forces
    * it via `broadcastEval` — an unconditional hint would ship the
    * *exploded gram table* (≈ n rows per eval word) to the driver and
    * OOM it at exactly the 50k-doc benchmark-decontamination scale this
    * operator is named for. Above the bound, AQE picks the join
    * strategy from runtime sizes. */
  def ngramContamination(
      corpus: DataFrame, corpusId: String, corpusText: String,
      eval_ : DataFrame, evalId: String, evalText: String,
      n: Int = 13, minShared: Int = 1,
      broadcastEval: Option[Boolean] = None): DataFrame = {
    def grams(df: DataFrame, id: String, text: String, outId: String): DataFrame =
      df.withColumn("__w", TextFunctions.words(col(text)))
        .select(col(id).as(outId),
          explode(TextFunctions.wordNgramsFromWords(col("__w"), n)).as("__g"))
        .select(col(outId), xxhash64(col("__g")).as("__gh"))
    val c = grams(corpus, corpusId, corpusText, "corpus_id")
    val e = grams(eval_, evalId, evalText, "eval_id")
    // gram-table size ≈ a few × eval text bytes (one (id, hash) row per
    // word); 1 MB of input keeps even the exploded broadcast well under
    // typical driver/executor headroom (the mergeUnlessTiny calibration:
    // a pruned scan of well-compressed text reports ~30% of file bytes,
    // and the broadcast payload is the DECOMPRESSED gram table)
    val evalBytes = eval_.queryExecution.optimizedPlan.stats.sizeInBytes
    val forceBroadcast = broadcastEval.getOrElse(evalBytes < BigInt(1L << 20))
    // above the gate the exploded eval gram table must not be left to
    // static estimate election either — its width-ratio estimate can
    // sit under the broadcast threshold with 50-100x decompressed
    // actuals (the mergeUnlessTiny gap class), and a broadcast build
    // has no shuffle below it for AQE to re-decide
    val evalSide = if (forceBroadcast) broadcast(e) else e.hint("merge")
    c.join(evalSide, "__gh")
      .groupBy("corpus_id", "eval_id")
      .agg(countDistinct(col("__gh")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Prefix-filter set-containment join (the prefix-filtering principle
    * of the set-similarity-join literature — SSJoin, Chaudhuri et al.
    * ICDE'06; PPJoin, Xiao et al. WWW'08): (needle, haystack) pairs
    * whose word-n-gram containment |G(n) ∩ G(h)| / |G(n)| ≥ `threshold`.
    *
    * The asymmetric complement of [[minhashNearDupPairs]]: a short
    * quote or excerpt inside a long document has containment ≈ 1 but
    * Jaccard ≈ |G(n)|/|G(h)| → 0, so Jaccard-tuned LSH bands
    * systematically miss exactly the pairs a licensing / provenance
    * sweep is after. No LSH here — candidate recall is EXACT:
    *
    * Each needle's grams are ordered by ascending document frequency in
    * the haystack corpus (ties by gram hash). If containment ≥ t then
    * at most |G(n)| − ⌈t·|G(n)|⌉ of the needle's grams are absent from
    * the haystack, so among ANY L = |G(n)| − ⌈t·|G(n)|⌉ + 1 of its
    * grams at least one is present (pigeonhole) — equi-joining the L
    * RAREST against the haystack's inverted postings finds every
    * qualifying pair, and rarest-first makes the candidate volume per
    * needle the MINIMUM the principle allows (Σ df over the prefix; at
    * t = 1.0 the prefix is the single globally-rarest gram). Grams
    * absent from every haystack carry df 0: free to keep (they match no
    * postings) and each one provably spends an "absence" the pigeonhole
    * bound already budgets.
    *
    * Scale shape — the engine OWNS every join strategy here, because
    * size estimates downstream of an explode are width-ratio guesses
    * that once misplanned a 10× replica's posting list (corpus-scale)
    * as a BROADCAST and OOM'd the driver. Document frequencies are
    * computed only for grams that appear in some needle (semantically
    * free: the df of any other gram is never read), so the df
    * aggregate's shuffle carries needle-gram grain, not corpus grain;
    * prefix selection is a per-needle sort of its OWN gram list (state
    * = the gram array the needle already carries). The routing gate is
    * the measured optimizer bytes of the PRE-explode needle input (file
    * scan stats, the reliable kind — same policy as
    * [[ngramContamination]]): a small needle frame (the licensing /
    * provenance sweep shape) BROADCASTS its gram set, prefixes, and df
    * table, so the corpus-sized posting stream is filtered in place and
    * never shuffled before candidates exist; a corpus-sized needle
    * frame pins sort-merge (`merge` hints) on every gram join — AQE
    * skew-splits a hot gram's SMJ side, and nothing corpus-scale is
    * ever a build side. The one always-SMJ edge is the verify fetch of
    * haystack gram arrays (id-keyed, candidates only on the probe
    * side). Worst case is a needle whose rarest gram is corpus-wide
    * boilerplate: candidates degrade to that gram's df, which is the
    * irreducible cost of an exact answer (any correct algorithm must
    * consider every haystack that could contain the needle).
    *
    * @param broadcastNeedles force the needle-side broadcast route
    *        (None = measured-bytes gate at 1 MB pre-explode)
    * @return (needle_id, haystack_id, containment), every pair with
    *         containment ≥ threshold, needles with empty gram sets
    *         excluded. Consume with ONE action (self-releasing caches —
    *         see [[unpersistAfterFirstUse]]). */
  def containmentJoin(
      needles: DataFrame, needleId: String, needleText: String,
      haystack: DataFrame, hayId: String, hayText: String,
      shingleN: Int = 3,
      threshold: Double = 1.0,
      broadcastNeedles: Option[Boolean] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold must be in (0, 1]")
    // 1 MB compressed-estimate bound (the mergeUnlessTiny calibration:
    // pruned scans of well-compressed text report ~30% of file bytes,
    // and the broadcast payload is the DECOMPRESSED gram table)
    val needleBytes = needles.queryExecution.optimizedPlan.stats.sizeInBytes
    val smallNeedles = broadcastNeedles.getOrElse(needleBytes < BigInt(1L << 20))
    // needle-derived frames broadcast on the small route, else nothing
    // here is ever a broadcast build side
    def ndlSide(df: DataFrame): DataFrame =
      if (smallNeedles) broadcast(df) else df.hint("merge")
    // grams are SETS here (array_distinct): containment's denominator
    // is |G(n)| distinct and array_intersect dedups anyway. Grams ride
    // as xxhash64 LONGS everywhere (the [[ngramContamination]]
    // convention): 8 bytes per key across every shuffle/sort/intersect
    // instead of the gram text, with collision-freeness shared with the
    // oracle's true-gram restatement.
    def gramSets(df: DataFrame, id: String, text: String, outId: String) =
      rebalance(df)
        .withColumn("__w", TextFunctions.words(col(text)))
        .select(col(id).as(outId),
          array_distinct(transform(
            TextFunctions.wordNgramsFromWords(col("__w"), shingleN),
            g => xxhash64(g))).as("__grams"),
          lit(callSeq.incrementAndGet()).as("__ct_call"))
        .filter(size(col("__grams")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val hay = gramSets(haystack, hayId, hayText, "__hid")
    val ndl = gramSets(needles, needleId, needleText, "__nid")

    // Inverted postings over the haystack corpus; document frequencies
    // only for grams that occur in some needle (the df of any other
    // gram is never read — the left join below starts FROM needle
    // grams), so on the small route the semi filter runs inside the
    // posting scan and the count's shuffle carries needle-gram grain.
    val postings = hay.select(col("__hid"), explode(col("__grams")).as("__g"))
    val needleGrams = ndl.select(explode(col("__grams")).as("__g")).distinct()
    val dfreq = postings
      .join(ndlSide(needleGrams), Seq("__g"), "leftsemi")
      .groupBy("__g").agg(count(lit(1)).as("__df"))

    // Per-needle prefix: the L rarest grams by (haystack df, gram).
    // dfreq is needle-gram grain by construction, so it rides the
    // needle-side route too.
    val prefixes = ndl
      .select(col("__nid"), size(col("__grams")).as("__n"),
        explode(col("__grams")).as("__g"))
      .join(ndlSide(dfreq), Seq("__g"), "left")
      .na.fill(0L, Seq("__df"))
      .groupBy("__nid")
      .agg(first(col("__n")).as("__n"),
        sort_array(collect_list(struct(col("__df"), col("__g")))).as("__ord"))
      // m = fewest matching grams that satisfy the verify predicate's
      // OWN double arithmetic (i / n >= t). ceil(t*n) alone can round
      // UP across an exact integer product (0.07 * 100 =
      // 7.000000000000001 -> 8) and silently shrink the prefix below
      // the pigeonhole bound — the one-step-down check restores
      // consistency (the product's error is < 1, so m is never more
      // than one below the computed ceil).
      .withColumn("__m0", ceil(lit(threshold) * col("__n")))
      .withColumn("__m",
        when((col("__m0") - 1).cast("double") / col("__n").cast("double")
          >= threshold, col("__m0") - 1).otherwise(col("__m0")))
      .withColumn("__L",
        greatest(col("__n") - col("__m") + 1, lit(1L)).cast("int"))
      .select(col("__nid"), explode(slice(col("__ord"), lit(1), col("__L"))).as("__p"))
      .select(col("__nid"), col("__p.__g").as("__g"))

    // Candidate join: on the small route the prefixes broadcast and the
    // corpus posting stream is filtered where it stands — no corpus
    // bytes move until a candidate exists.
    val cand = postings.join(ndlSide(prefixes), "__g")
      .select(col("__nid"), col("__hid")).distinct()

    val out = cand
      .join(ndlSide(ndl.select(col("__nid"), col("__grams").as("__gn"))), "__nid")
      .join(hay.select(col("__hid"), col("__grams").as("__gh")).hint("merge"),
        "__hid")
      .withColumn("containment",
        size(array_intersect(col("__gn"), col("__gh"))).cast("double")
          / size(col("__gn")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("__nid").as("needle_id"), col("__hid").as("haystack_id"),
        col("containment"))
    unpersistAfterFirstUse(unpersistAfterFirstUse(out, hay), ndl)
  }

  /** Deterministic stratified sample for corpus mixing: per-stratum
    * sampling fractions (e.g. {"en" -> 1.0, "web" -> 0.1}) applied with
    * a seeded hash of the id column — reproducible across runs and
    * executors (unlike rand()-based sampleBy under task retry), and a
    * pure narrow filter: no shuffle, safe at any scale. Strata missing
    * from the map default to `defaultFraction`. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: Column,
      idCol: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: Long = 0L): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val buckets = 1000000L
    val hashed = pmod(xxhash64(idCol, lit(seed)), lit(buckets)).cast("double") / buckets.toDouble
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(stratumCol === k, lit(f)).otherwise(acc)
    }
    df.filter(hashed < frac)
  }

  /** Deterministic weighted mixture sampling for training-data domain
    * mixing: keep each row with probability `weightCol` (per-row, 0..1
    * — typically a per-source/domain weight), decided by a salted md5
    * of the key. Like [[stratifiedSample]] a pure narrow filter
    * (reproducible under retry, no shuffle, any scale), but hashed with
    * md5 instead of xxhash64 so the decision is CROSS-ENGINE
    * replayable — md5 exists in every SQL engine, which makes the
    * sample value-verifiable (and exactly reproducible by a downstream
    * consumer that isn't Spark). Decision: first 8 hex chars of
    * md5(salt:key), compared as lowercase hex against floor(w·2^32) —
    * a pure string comparison, no 64-bit parsing needed. */
  def mixtureSample(
      df: DataFrame,
      keyCol: Column,
      weightCol: Column,
      salt: String = "graft"): DataFrame = {
    val h = substring(md5(concat(lit(salt), lit(":"), keyCol.cast("string")).cast("binary")), 1, 8)
    val thr = lower(lpad(hex(floor(weightCol.cast("double") * lit(4294967296.0)).cast("long")), 8, "0"))
    // Both tails short-circuit before the hex encoding: weight >= 1
    // would lpad-TRUNCATE its 9-hex threshold to "10000000" (< most
    // hashes, dropping rows), and weight <= 0 (or negative from
    // derived arithmetic) would hex a NEGATIVE long to 16 chars that
    // truncate to ~"ffffffff" (keeping ~all rows); NaN fails both
    // guards and is dropped rather than tripping the ANSI cast.
    df.filter(weightCol >= 1.0 || (weightCol > 0.0 && h < thr))
  }

  /** Systematic probability-proportional-to-size sampling (the classic
    * survey-sampling PPS design): lay the rows out on an integer line
    * where each row occupies `weightCol` positions (its exclusive
    * prefix sum in `idCol` order — [[Packing.withStartOffset]]'s
    * distributed prefix sum, no global window), then drop `n` equally
    * spaced grid points j·W/n (j = 0..n-1) on the line; a row is drawn
    * once per grid point inside its interval. Heavy rows can draw more
    * than once (`n_picks` > 1 — multiplicity is the PPS contract);
    * expected draws = n·w/W exactly.
    *
    * Everything is BIGINT arithmetic — prefix sums, ceil-divisions —
    * so the sample is bit-identical on any engine at any aggregation
    * order: ceil(a/b) = (a + b − 1) div b with a·n kept in long (fine
    * to ~2^53/W samples; a 100 TB corpus with n in the millions moves
    * the products to decimal(38), changing no logic).
    *
    * @param weightCol non-negative INTEGER weights (e.g. token
    *                  counts); zero-weight rows occupy no interval and
    *                  are never drawn
    * @return rows with n_picks >= 1: (all input columns, start_offset,
    *         n_picks)
    */
  def systematicWeightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = col(weightCol).cast("long")
    val total = df.agg(sum(w).as("__W"))
    val prefixed = Packing.withStartOffset(df, idCol, weightCol)
      .crossJoin(broadcast(total))
    // ceil(a / W) in exact long arithmetic: (a + W - 1 - (a + W - 1) mod W) / W.
    // The quotient extraction divides an exact multiple of W in double
    // precision, which is only exact while the numerator fits a double
    // mantissa — guard loudly instead of sampling silently wrong
    // (raise_error compiles to one branch per row; the decimal(38)
    // swap documented above lifts the ceiling without changing logic).
    def cdiv(a: Column): Column = {
      val num = a + col("__W") - 1L
      val guarded = when(num > lit(1L << 53),
        raise_error(concat(lit("systematicWeightedSample: start*n exceeds 2^53 ("),
          num.cast("string"), lit(") — switch to decimal arithmetic")))
        .cast("long")).otherwise(num)
      ((guarded - pmod(guarded, col("__W"))) / col("__W")).cast("long")
    }
    prefixed
      .withColumn("n_picks",
        cdiv((col("start_offset") + w) * n) - cdiv(col("start_offset") * n))
      .filter(col("n_picks") >= 1)
      .drop("__W")
  }

  /** All ordered pairs (a<b) of an array column — used inside one LSH
    * bucket. Type-agnostic: struct elements sort by natural struct
    * ordering (first field — the id — leading), so every unordered pair
    * is emitted exactly once as (lo, hi) regardless of arrival order. */
  private def pairsOf(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sorted, (a, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), b => struct(a.as("_1"), b.as("_2")))))
  }

  /** Exact Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact-duplicate pairs (identical whitespace-token multiset):
    * candidates share a 64-bit fingerprint of (simhash, sorted token
    * multiset) — identical multisets always collide, so no false
    * negatives — then exact sorted-token verification on candidates
    * only, so a fingerprint collision can't produce a false pair. (A
    * bare simhash hamming=0 cut is NOT exact — simhash is
    * single-token-insensitive whenever no bit counter sits on a sign
    * boundary, measured ~10% of one-token-apart pairs on the test
    * corpus.)
    *
    * Pair generation is a hash equi-join on the fingerprint, NOT a
    * collect_list bucket: a duplicate group of any size distributes
    * across reducers, so there is no bucket-size cap and no silent
    * recall loss on mega-groups (the most-duplicated document is
    * exactly the one an exact-dup pass must report; review r3). The
    * shuffles carry only (fingerprint, id) rows — token arrays are
    * recomputed narrowly for the candidate verification, never
    * shuffled with the corpus. Output is inherently O(Σ group²) pairs,
    * the operator's declared semantics. */
  def simhashExactDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = rebalance(df).select(col(idCol).as("id"),
      sort_array(TextFunctions.tokens(col(textCol))).as("mt"),
      TextFunctions.simhash64(col(textCol)).as("sim"))
    val keyed = toks.select(col("id"), xxhash64(col("sim"), col("mt")).as("__fp"))
    val cand = keyed.select(col("__fp"), col("id").as("id_a"))
      .join(keyed.select(col("__fp"), col("id").as("id_b")), "__fp")
      .filter(col("id_a") < col("id_b"))
    cand
      .join(toks.select(col("id").as("id_a"), col("mt").as("mt_a")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("mt").as("mt_b")), "id_b")
      .filter(col("mt_a") === col("mt_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs: banded simhash LSH candidates verified by
    * full hamming distance <= maxHamming. Returns (id_a, id_b,
    * hamming). `maxBucketSize` here is a documented recall/cost
    * trade-off for NEAR-dup mining (degenerate buckets — e.g. empty
    * text — are junk, not signal); for exact duplicates use
    * [[simhashExactDupPairs]], which has no cap. */

  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    // Banded simhash LSH: split 64 bits into `bands` segments; a pair
    // within hamming distance (bands-1) must agree exactly on >=1
    // segment (pigeonhole) — same guarantee simhash dedup uses at scale.
    // bands=1 is rejected loudly: its 64-bit segment mask (1L << 64)
    // wraps to 0 in the JVM, putting the whole corpus in one seg=0
    // bucket that the size cap then silently drops — zero pairs, no
    // error. bands > 32 would leave < 2 bits per segment.
    require(bands >= 2 && bands <= 32 && 64 % bands == 0,
      s"bands must divide 64 and lie in [2, 32], got $bands")
    // the pigeonhole guarantee covers hamming <= bands-1 ONLY: beyond
    // it a pair whose differing bits span every segment shares no
    // bucket and silently drops from output that claims completeness —
    // the same silent-recall-loss class the bands=1 reject guards
    // (review r12)
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming exceeds the pigeonhole guarantee of " +
        s"bands-1=${bands - 1} exact-segment matches — raise bands or " +
        "lower maxHamming")
    val bits = 64 / bands
    val hashed = rebalance(df).select(col(idCol).as("id"),
      TextFunctions.simhash64(col(textCol)).as("sim"))
    val banded = hashed.select(col("id"), col("sim"),
        posexplode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("sim"), b * bits).bitwiseAND(lit((1L << bits) - 1)).as("seg"))
        }: _*)))
      .select(col("id"), col("sim"), col("col.band").as("band"), col("col.seg").as("seg"))
    // bounded_collect: O(maxBucketSize) aggregation state even when a
    // degenerate segment holds the whole corpus (see minhash path)
    val buckets = banded.groupBy("band", "seg")
      .agg(BoundedCollect.column(struct(col("id"), col("sim")), maxBucketSize).as("xs"))
      .filter(col("xs").isNotNull && size(col("xs")) >= 2)
    buckets
      .select(explode(pairsOf(col("xs"))).as("p"))
      .select(col("p._1.id").as("id_a"), col("p._1.sim").as("sim_a"),
        col("p._2.id").as("id_b"), col("p._2.sim").as("sim_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
      .withColumn("hamming", TextFunctions.hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
