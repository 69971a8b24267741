package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) at word grain + chunk-grain
  * duplicate coverage — the insertion-robust substring-dedup signal
  * (the rsync/LBFS/FastCDC idea applied to corpus text: chunk
  * boundaries depend only on LOCAL content, so an insertion or
  * deletion shifts boundaries only near the edit and every other
  * chunk's fingerprint survives — unlike fixed-width windows, where
  * one inserted word re-fingerprints the whole document's tail).
  *
  * Boundary rule: word w starts a new chunk iff the first hex char of
  * md5("<salt>:" + w) is '0' (P = 1/16 → expected chunk ≈ 16 words;
  * the first word of a document never flags). md5 keeps the decision
  * cross-engine replayable in exact string arithmetic — the
  * [[Sharding.rendezvousShard]] / [[Dedup]] mixture-sample discipline.
  *
  * Scale shape: one corpus explode (posexplode of the word array), a
  * doc-keyed running-sum window for chunk ids (key-partitioned —
  * bounded by document length, never a global window), two hash
  * aggregations (chunk assembly, fingerprint counts), and one
  * chunk-grain join routed through [[Dedup.mergeUnlessTiny]] (chunk
  * tables grow with the corpus — never an estimate-elected broadcast).
  * Nothing quadratic: duplicate detection is exact group-by on the
  * chunk fingerprint, not pairwise comparison.
  *
  * Reference scope note: gojek/feast has no corpus chunking; this
  * sits in the LLM-pipeline dedup family (SURVEY §2 additions) next
  * to dup-span coverage (fixed n-gram windows) as its
  * insertion-robust complement.
  */
object Chunking {

  /** Expected 1-in-16 boundary: first md5 hex char of the salted word. */
  def isBoundary(word: Column, salt: String = "cdc"): Column =
    substring(md5(concat(lit(s"$salt:"), word).cast("binary")), 1, 1) === "0"

  /** FastCDC-style MAX-size forced cut: a degenerate document (one
    * repeated non-boundary word, binary-ish noise) would otherwise
    * form ONE document-sized chunk — an unbounded assembly group. A
    * position-gated cut every `MaxChunkWords` bounds every chunk (and
    * its collect_list group) at ~40 KB of text; like FastCDC's
    * max-size cut it is less edit-stable than a content boundary, but
    * it only ever fires inside boundary-free stretches ≥ 4096 words
    * (P ≈ (15/16)^4096 for real text — degenerate inputs only). */
  val MaxChunkWords = 4096

  /** Per-chunk table: (idCol, chunk_idx, n_words, fp) — fp = md5 of
    * the space-joined chunk words. Documents with no words emit no
    * chunks (the callers' join universe). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      salt: String = "cdc"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("__pos", "__w")))
      .withColumn("__b",
        when(col("__pos") > 0 &&
            (isBoundary(col("__w"), salt) ||
              col("__pos") % MaxChunkWords === 0), 1L).otherwise(0L))
      .withColumn("chunk_idx", sum(col("__b")).over(w))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"),
        // order restored from the carried positions — collect_list
        // alone has no ordering contract across partitions/retries
        md5(array_join(transform(
            array_sort(collect_list(struct(col("__pos"), col("__w")))),
            x => x.getField("__w")), " ").cast("binary")).as("fp"))
  }

  /** Per-document chunk-duplication coverage: n_chunks, n_dup_chunks
    * (chunks whose fingerprint appears in MORE THAN ONE distinct
    * document — within-doc repeats alone don't count, matching the
    * cross-document contamination question), and the dup fraction.
    * The fingerprint-count side is chunk-grain (corpus-scaling) —
    * routed, never broadcast. */
  def cdcDupCoverage(df: DataFrame, idCol: String, textCol: String,
      salt: String = "cdc"): DataFrame = {
    val chunks = cdcChunks(df, idCol, textCol, salt)
    val shared = chunks.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") > 1)
      .select(col("fp"), lit(1L).as("__dup"))
    chunks.join(Dedup.mergeUnlessTiny(df)(shared), Seq("fp"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_chunks"))
      .select(col(idCol), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
          .as("dup_fraction"))
  }
}
