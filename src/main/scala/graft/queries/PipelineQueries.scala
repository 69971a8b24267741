package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.functions.{Components, Dedup, Multimodal, Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Training-data-pipeline operator queries over documents/embeddings:
  * text analysis, dedup (exact / MinHash-LSH / SimHash / n-gram
  * Jaccard / embedding), similarity search, multimodal plumbing.
  *
  * Near-dup queries construct duplicates from the corpus itself
  * (doc_id/vec_id + 1_000_000 clones of every 10th row) so recall is
  * provable: with the thresholds used, a reported pair ⇔ identical
  * shingle set / identical vector, which the DuckDB oracle states
  * independently of the LSH implementation.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  // ---- text analysis --------------------------------------------------

  /** [[Dedup.rebalance]] before the projection: a bench-sf documents
    * table is one parquet file -> one scan task, serializing five
    * regex passes on one core while the rest idle; at real scale the
    * table is many files and the rebalance is a no-op. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Dedup.rebalance(docs(s, dir)).select(
      col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("n_tokens"),
      TF.bpeTokenEstimate(col("text")).cast("long").as("n_bpe_tokens"),
      TF.punctCount(col("text")).cast("long").as("punct_cnt"),
      TF.stopwordCount(col("text")).cast("long").as("stopword_cnt"),
      round(TF.qualityScore(col("text")), 4).as("quality"))

  val textStatsSql: String =
    """SELECT doc_id, n_tokens, n_bpe_tokens, punct_cnt, stopword_cnt,
      |       round(least(n_tokens / 100.0, 1.0)
      |             * (1.0 - least(punct_cnt / greatest(CAST(n_tokens AS DOUBLE), 1.0), 1.0))
      |             * (0.5 + least(stopword_cnt / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 2.0, 0.5)),
      |             4) AS quality
      |FROM (
      |  SELECT doc_id,
      |         len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS n_bpe_tokens,
      |         len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS punct_cnt,
      |         len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is|it|for|on)\b')) AS stopword_cnt
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Sentence segmentation stats: sentences = maximal runs of
    * non-terminator chars closed by terminator(s) — an RE2-safe
    * pattern (no lookbehind), so DuckDB executes the identical regex;
    * trailing un-terminated text counts as a final sentence. Mean
    * sentence length in whitespace tokens; codegen'd narrow projection
    * at scan speed. */
  def sentenceSplit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      (size(regexp_extract_all(col("text"), lit("[^.!?]+[.!?]+"), lit(0))) +
        when(regexp_extract(col("text"), "[^.!?\\s][^.!?]*$", 0) =!= "", 1)
          .otherwise(0)).cast("long").as("n_sentences"),
      TF.tokenCount(col("text")).cast("long").as("n_tokens"))
    .withColumn("mean_sentence_tokens",
      round(col("n_tokens").cast("double") /
        greatest(col("n_sentences").cast("double"), lit(1.0)), 4))
    .orderBy("doc_id")

  val sentenceSplitSql: String =
    """SELECT doc_id, n_sentences, n_tokens,
      |       round(CAST(n_tokens AS DOUBLE)
      |             / greatest(CAST(n_sentences AS DOUBLE), 1.0), 4) AS mean_sentence_tokens
      |FROM (
      |  SELECT doc_id,
      |         len(regexp_extract_all(text, '[^.!?]+[.!?]+'))
      |         + CASE WHEN regexp_extract(text, '[^.!?\s][^.!?]*$', 0) <> ''
      |                THEN 1 ELSE 0 END AS n_sentences,
      |         len(regexp_extract_all(text, '\S+')) AS n_tokens
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  def langIdQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TF.langScore(col("text"), TF.LangMarkers(0)._2).cast("long").as("s_en"),
      TF.langScore(col("text"), TF.LangMarkers(1)._2).cast("long").as("s_de"),
      TF.langScore(col("text"), TF.LangMarkers(2)._2).cast("long").as("s_fr"),
      TF.langScore(col("text"), TF.LangMarkers(3)._2).cast("long").as("s_es"),
      TF.langId(col("text")).as("lang_pred"))
    .orderBy("doc_id")

  val langIdSql: String = {
    def score(ms: Seq[String]) =
      s"len(regexp_extract_all(lower(text), '\\b(${ms.mkString("|")})\\b'))"
    val en = score(TF.LangMarkers(0)._2); val de = score(TF.LangMarkers(1)._2)
    val fr = score(TF.LangMarkers(2)._2); val es = score(TF.LangMarkers(3)._2)
    s"""SELECT doc_id, s_en, s_de, s_fr, s_es,
       |       CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
       |            WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
       |            WHEN s_fr >= s_es THEN 'fr'
       |            ELSE 'es' END AS lang_pred
       |FROM (SELECT doc_id, $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Chunking: split each doc into 32-word windows with 8-word overlap,
    * emit one row per chunk (id, index, words-in-chunk, chunk hash) —
    * value-checked against DuckDB computing the identical windows. */
  def chunking(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("__w", TF.words(col("text")))
      .filter(size(col("__w")) > 0)
      .select(col("doc_id"), posexplode(TF.wordChunks(col("__w"), 32, 8)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        size(TF.words(col("col"))).cast("long").as("n_chunk_words"),
        md5(col("col").cast("binary")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  val chunkingSql: String =
    """WITH w AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, ws, len(ws) AS L,
      |         greatest(CAST(ceil((len(ws) - 8) / 24.0) AS BIGINT), 1) AS n
      |  FROM w WHERE len(ws) > 0)
      |SELECT doc_id, i AS chunk_idx,
      |       CAST(least(i * 24 + 32, L) - i * 24 AS BIGINT) AS n_chunk_words,
      |       md5(array_to_string(ws[i * 24 + 1 : least(i * 24 + 32, L)], ' ')) AS chunk_hash
      |FROM c, UNNEST(range(0, n)) AS t(i)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Character-entropy quality signal. */
  def charEntropyQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(length(col("text")) > 0)
      .withColumn("__cs", TF.charsOf(col("text")))
      .select(col("doc_id"), round(TF.charEntropyFromChars(col("__cs")), 6).as("entropy"))
      .orderBy("doc_id")

  val charEntropySql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |         list_filter(string_split(lower(text), ''), x -> x <> '') AS cs
      |  FROM documents WHERE length(text) > 0)
      |SELECT doc_id,
      |       round(list_aggregate(
      |         list_transform(list_sort(list_distinct(cs)), ch ->
      |           -(CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / len(cs))
      |            * log2(CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / len(cs))),
      |         'sum'), 6) AS entropy
      |FROM c ORDER BY doc_id""".stripMargin

  /** Repetition-ratio quality signal (boilerplate/spam detector). */
  def repetitionQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("__w", TF.words(col("text")))
      .filter(size(col("__w")) > 0)
      .select(col("doc_id"), size(col("__w")).cast("long").as("n_words"),
        size(array_distinct(col("__w"))).cast("long").as("n_distinct"),
        round(TF.repetitionRatio(col("__w")), 4).as("rep_ratio"))
      .orderBy("doc_id")

  val repetitionSql: String =
    """SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
      |       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
      |       round(1.0 - len(list_distinct(ws)) / greatest(CAST(len(ws) AS DOUBLE), 1.0), 4)
      |         AS rep_ratio
      |FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents)
      |WHERE len(ws) > 0 ORDER BY doc_id""".stripMargin

  /** PII scrubbing: deterministic PII (email, phone, IP derived from
    * doc_id) appended to each document in BOTH engines, then scrubbed —
    * value-checks the replacement semantics, not just the plumbing. */
  def piiScrub(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com"),
          lit(" or call +1 (555) 010-"), pmod(col("doc_id"), lit(10000L)),
          lit(" from 10.0.0.1")).as("t2"))
      .select(col("doc_id"), TF.scrubPii(col("t2")).as("scrubbed"))
      .orderBy("doc_id")

  val piiScrubSql: String =
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |             || ' or call +1 (555) 010-' || CAST(doc_id % 10000 AS VARCHAR)
      |             || ' from 10.0.0.1',
      |        '[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\.[A-Za-z]{2,}|([0-9]{1,3}\.){3}[0-9]{1,3})', '<EMAIL>', 'g'),
      |      '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
      |    '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
      |FROM documents ORDER BY doc_id""".stripMargin

  /** URL extraction over documents with deterministic appended URLs. */
  def urlExtract(s: SparkSession, dir: String): DataFrame = {
    val t2 = concat(col("text"),
      lit(" see https://example.com/d/"), col("doc_id"),
      lit(" and http://mirror.net/"), pmod(col("doc_id"), lit(97L)))
    docs(s, dir).select(col("doc_id"), TF.urls(t2).as("u"))
      .select(col("doc_id"), size(col("u")).cast("long").as("n_urls"),
        element_at(col("u"), 1).as("first_url"), element_at(col("u"), -1).as("last_url"))
      .orderBy("doc_id")
  }

  val urlExtractSql: String =
    """SELECT doc_id, CAST(len(u) AS BIGINT) AS n_urls, u[1] AS first_url, u[-1] AS last_url
      |FROM (SELECT doc_id,
      |             regexp_extract_all(
      |               text || ' see https://example.com/d/' || CAST(doc_id AS VARCHAR)
      |                    || ' and http://mirror.net/' || CAST(doc_id % 97 AS VARCHAR),
      |               'https?://[^\s]+') AS u
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Int8 embedding quantization (4x storage compression): per-vector
    * scale + quantized elements, value-checked against DuckDB running
    * the identical IEEE arithmetic (max/div/round/clamp are exact, so
    * the raw double scale and the int vector hash match bitwise). */
  def embeddingQuantize(s: SparkSession, dir: String): DataFrame =
    embs(s, dir)
      .withColumn("__scale", Similarity.int8Scale(col("embedding")))
      .withColumn("__qz", Similarity.quantizeInt8(col("embedding"), col("__scale")))
      .select(col("vec_id"), col("__qz.scale").as("scale"),
        md5(concat_ws(",", col("__qz.q")).cast("binary")).as("q_hash"),
        aggregate(col("__qz.q"), lit(0L), (acc, x) => acc + x.cast("long")).as("q_sum"))
      .orderBy("vec_id")

  val embeddingQuantizeSql: String =
    """WITH z AS (
      |  SELECT vec_id, embedding,
      |         greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
      |                  1e-12) / 127.0 AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, scale,
      |         list_transform(embedding, x ->
      |           CAST(least(greatest(round(CAST(x AS DOUBLE) / scale, 0), -127.0), 127.0)
      |                AS INT)) AS qv
      |  FROM z)
      |SELECT vec_id, scale,
      |       md5(array_to_string(qv, ',')) AS q_hash,
      |       CAST(list_sum(qv) AS BIGINT) AS q_sum
      |FROM q ORDER BY vec_id""".stripMargin

  /** Benchmark decontamination: corpus docs sharing >= 3 distinct word
    * 8-grams with an eval set (every 100th doc, re-identified) — the
    * planted clones must surface plus any organic overlap, which the
    * oracle derives identically from canonical gram sets. */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val ev = d.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 2000000L).as("eval_doc_id"), col("text"))
    Dedup.ngramContamination(d, "doc_id", "text", ev, "eval_doc_id", "text",
        n = 8, minShared = 3)
      .select(col("corpus_id"), col("eval_id"), col("n_shared").cast("long").as("n_shared"))
      .orderBy("corpus_id", "eval_id")
  }

  val contaminationSql: String =
    """WITH g AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |cg AS (
      |  SELECT doc_id AS corpus_id,
      |         UNNEST(list_distinct(list_transform(
      |           range(1, greatest(len(w) - 7, 0) + 1),
      |           i -> array_to_string(w[i:i+7], ' ')))) AS gram
      |  FROM g),
      |eg AS (
      |  SELECT doc_id + 2000000 AS eval_id,
      |         UNNEST(list_distinct(list_transform(
      |           range(1, greatest(len(w) - 7, 0) + 1),
      |           i -> array_to_string(w[i:i+7], ' ')))) AS gram
      |  FROM g WHERE doc_id % 100 = 0)
      |SELECT corpus_id, eval_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_shared
      |FROM cg JOIN eg USING (gram)
      |GROUP BY corpus_id, eval_id
      |HAVING count(DISTINCT gram) >= 3
      |ORDER BY corpus_id, eval_id""".stripMargin

  /** Composed training-data pipeline, value-checked end-to-end: quality
    * score + language ID -> filter (quality > 0.3, en) -> exact dedup on
    * the normalized fingerprint (min doc_id wins) -> chunk count per
    * surviving doc. Exercises operator COMPOSITION — each stage's output
    * feeds the next inside one plan, the shape a real corpus build runs. */
  def pipelineE2e(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
      .withColumn("__w", TF.words(col("text")))
      .filter(size(col("__w")) > 0)
      .withColumn("quality", TF.qualityScore(col("text")))
      .withColumn("lang", TF.langId(col("text")))
      .filter(col("quality") > 0.3 && col("lang") === "en")
      .withColumn("fp", TF.fingerprint(col("text")))
    Dedup.exactDedup(base, col("fp"), col("doc_id"))
      .select(col("doc_id"), round(col("quality"), 4).as("quality"),
        size(TF.wordChunks(col("__w"), 32, 8)).cast("long").as("n_chunks"))
      .orderBy("doc_id")
  }

  val pipelineE2eSql: String = {
    def score(ms: Seq[String]) =
      s"len(regexp_extract_all(lower(text), '\\b(${ms.mkString("|")})\\b'))"
    val en = score(TF.LangMarkers(0)._2); val de = score(TF.LangMarkers(1)._2)
    val fr = score(TF.LangMarkers(2)._2); val es = score(TF.LangMarkers(3)._2)
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
       |         len(regexp_extract_all(text, '\\S+')) AS n_tok,
       |         len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS punct,
       |         len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a|in|is|it|for|on)\\b')) AS stop,
       |         $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, w,
       |         least(n_tok / 100.0, 1.0)
       |           * (1.0 - least(punct / greatest(CAST(n_tok AS DOUBLE), 1.0), 1.0))
       |           * (0.5 + least(stop / greatest(CAST(n_tok AS DOUBLE), 1.0) * 2.0, 0.5)) AS quality,
       |         CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
       |              WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
       |              WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang,
       |         md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'),
       |                                 ' +', ' ', 'g'))) AS fp
       |  FROM t WHERE len(w) > 0),
       |d AS (
       |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       |                 FROM q WHERE quality > 0.3 AND lang = 'en')
       |  WHERE rn = 1)
       |SELECT doc_id, round(quality, 4) AS quality,
       |       CAST(greatest(CAST(ceil((len(w) - 8) / 24.0) AS BIGINT), 1) AS BIGINT) AS n_chunks
       |FROM d ORDER BY doc_id""".stripMargin
  }

  // ---- dedup -----------------------------------------------------------

  /** Exact dedup on the normalized-text fingerprint; keeps min doc_id
    * per group (at sf0.1 the corpus has genuine duplicates). */
  /** Typo-level near-dup pairs over the 40-char lowercased text prefix
    * (the title/entity-resolution modality — [[Dedup.editDistancePairs]]):
    * planted 1-char-typo clones of every 10th doc must pair with their
    * originals, plus whatever naturally-near prefixes exist. The oracle
    * verifies with a brute-force length-filtered levenshtein join —
    * same builtin, so values hash-match. */
  def dedupTypo(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), lower(substring(col("text"), 1, 40)).as("key"))
    val withClones = base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(substring(col("key"), 1, 7), lit("x"),
            expr("substring(key, 9)")).as("key")))
    Dedup.editDistancePairs(withClones, "doc_id", "key", maxEdits = 2)
      .orderBy("id_a", "id_b")
  }

  val dedupTypoSql: String =
    """WITH k0 AS (SELECT doc_id, lower(substr(text, 1, 40)) AS key FROM documents),
      |k AS (
      |  SELECT doc_id, key FROM k0
      |  UNION ALL
      |  SELECT doc_id + 2000000, concat(substr(key, 1, 7), 'x', substr(key, 9))
      |  FROM k0 WHERE doc_id % 10 = 0)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
      |FROM k a JOIN k b
      |  ON a.doc_id < b.doc_id AND abs(length(a.key) - length(b.key)) <= 2
      |WHERE levenshtein(a.key, b.key) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val withFp = docs(s, dir).withColumn("fp", TF.fingerprint(col("text")))
    Dedup.exactDedup(withFp, col("fp"), col("doc_id"))
      .select(col("doc_id"), col("fp"))
      .orderBy("doc_id")
  }

  val dedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, fp
      |FROM (SELECT doc_id,
      |             md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'),
      |                                     ' +', ' ', 'g'))) AS fp
      |      FROM documents)
      |GROUP BY fp ORDER BY doc_id""".stripMargin

  /** Exact word-3-gram Jaccard between consecutive documents (the
    * verification primitive used inside LSH dedup, checked standalone). */
  def ngramJaccardChain(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val g = d
      .withColumn("__w", TF.words(col("text")))
      .select(col("doc_id"), TF.wordNgramsFromWords(col("__w"), 3).as("grams"))
    val a = g.alias("a"); val b = g.alias("b")
    // the neighbor side carries corpus-scaling gram arrays — routed,
    // never an estimate-elected broadcast build side; the gate reads
    // the UNPRUNED docs scan (the reliable grain), not the projected g
    a.join(Dedup.mergeUnlessTiny(d)(b), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("doc_id"),
        Dedup.jaccard(col("a.grams"), col("b.grams")).as("jaccard"))
      .orderBy("doc_id")
  }

  val ngramJaccardChainSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents))
      |SELECT a.doc_id AS doc_id,
      |       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |       / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
      |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
      |ORDER BY doc_id""".stripMargin

  /** Corpus ∪ exact clones of every 10th doc (ids + 1e6). */
  private def docsWithClones(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** MinHash-LSH near-dup pairs at threshold 0.999 ⇔ identical shingle
    * sets. The oracle derives the same pairs from a canonical gram-set
    * signature — implementation-independent. */
  /** k=32/bands=8 (r=4): recall for the oracle's exact-clone pairs
    * (jaccard 1.0) is exactly 1.0 at any banding — every band of an
    * identical shingle set matches — so the smaller signature only
    * shrinks candidate noise and CPU, not correctness. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPairs(docsWithClones(s, dir), "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, threshold = 0.999)

  val dedupMinhashSql: String =
    """WITH uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |), g AS (
      |  SELECT doc_id,
      |         md5(array_to_string(list_sort(list_distinct(
      |           list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))), chr(10))) AS sig,
      |         len(w) >= 3 AS ok
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM uni))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1.0 AS jaccard
      |FROM g a JOIN g b ON a.sig = b.sig AND a.doc_id < b.doc_id AND a.ok AND b.ok
      |ORDER BY id_a, id_b""".stripMargin

  /** Cross-corpus fuzzy incremental dedup
    * ([[Dedup.minhashCrossDupPairs]]): an incoming batch (every 10th
    * doc re-labeled) LSH-matched against the corpus — the fuzzy
    * complement of q_dedup_incremental's fingerprint anti-join. Same
    * provable-recall construction as q_dedup_minhash: at threshold
    * 0.999 a reported pair ⇔ identical shingle sets, which the oracle
    * states via canonical gram-set signatures, independent of the LSH. */
  def dedupIncrementalFuzzy(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val batch = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("batch_id"), col("text"))
    Dedup.minhashCrossDupPairs(d, "doc_id", "text", batch, "batch_id", "text",
        shingleN = 3, k = 32, bands = 8, threshold = 0.999)
      .orderBy("corpus_id", "batch_id")
  }

  val dedupIncrementalFuzzySql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |         md5(array_to_string(list_sort(list_distinct(
      |           list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))), chr(10))) AS sig,
      |         len(w) >= 3 AS ok
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents))
      |SELECT c.doc_id AS corpus_id, b.doc_id + 3000000 AS batch_id, 1.0 AS jaccard
      |FROM g c JOIN g b ON c.sig = b.sig AND b.doc_id % 10 = 0 AND c.ok AND b.ok
      |ORDER BY corpus_id, batch_id""".stripMargin

  /** Prefix-filter set-containment join ([[Dedup.containmentJoin]]):
    * needles = every 10th document truncated to its first ⌈w/2⌉ words
    * (ids + 2,000,000), whose word-3-gram sets are subsets of the full
    * document's by construction — the quote-inside-a-document shape
    * whose Jaccard (≈ ½ here, → 0 for short quotes) Jaccard-tuned LSH
    * bands systematically miss. At threshold 1.0 a reported pair ⇔
    * G(needle) ⊆ G(haystack), which the oracle states set-theoretically
    * (|∩| = |G(n)|) with an implementation-independent candidate prune
    * (a containing haystack must contain the needle's FIRST gram — any
    * gram works for subset). The operator's rarest-gram prefix
    * candidates have recall exactly 1 at t = 1.0, so reported pairs ≡
    * oracle pairs. */
  def dedupContainment(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val needles = d.filter(col("doc_id") % 10 === 0)
      .withColumn("__w", TF.words(col("text")))
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ",
          slice(col("__w"), lit(1),
            ceil(size(col("__w")) / 2.0).cast("int"))).as("text"))
    Dedup.containmentJoin(needles, "doc_id", "text", d, "doc_id", "text",
        shingleN = 3, threshold = 1.0)
      .select(col("needle_id"), col("haystack_id"),
        round(col("containment"), 6).as("containment"))
      .orderBy("needle_id", "haystack_id")
  }

  val dedupContainmentSql: String =
    """WITH base AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |hay AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
      |  FROM base),
      |ndl AS (
      |  SELECT doc_id + 2000000 AS doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(h) - 2, 0) + 1),
      |         i -> h[i] || ' ' || h[i+1] || ' ' || h[i+2])) AS grams
      |  FROM (SELECT doc_id, list_slice(w, 1, CAST(ceil(len(w) / 2.0) AS INT)) AS h
      |        FROM base WHERE doc_id % 10 = 0)
      |  WHERE len(h) >= 3),
      |cand AS (
      |  SELECT DISTINCT n.doc_id AS nid, hg.doc_id AS hid
      |  FROM (SELECT doc_id, grams[1] AS g FROM ndl) n
      |  JOIN (SELECT doc_id, unnest(grams) AS g FROM hay) hg ON n.g = hg.g)
      |SELECT c.nid AS needle_id, c.hid AS haystack_id, 1.0 AS containment
      |FROM cand c JOIN ndl n ON n.doc_id = c.nid JOIN hay h ON h.doc_id = c.hid
      |WHERE len(list_intersect(n.grams, h.grams)) = len(n.grams)
      |ORDER BY needle_id, haystack_id""".stripMargin

  /** The containment join's PRODUCTION shape ([[Dedup.containmentJoin]]
    * broadcast route): a tiny fixed needle set — three 12-word quotes
    * lifted from specific documents — swept against the whole corpus at
    * t = 1.0. The needle side measures far under the route gate, so the
    * plan broadcasts the needle-derived frames and the corpus posting
    * stream is filtered IN PLACE: zero corpus shuffles before
    * candidates exist (the verify fetch is the one merge join,
    * PlanSpec-pinned). The complement of [[dedupContainment]], whose
    * corpus-sized needle fixture pins the merge route. */
  def containmentSweep(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val needles = d.filter(col("doc_id").isin(3L, 17L, 42L))
      .withColumn("__w", TF.words(col("text")))
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat_ws(" ", slice(col("__w"), lit(1), lit(12))).as("text"))
    Dedup.containmentJoin(needles, "doc_id", "text", d, "doc_id", "text",
        shingleN = 3, threshold = 1.0)
      .select(col("needle_id"), col("haystack_id"),
        round(col("containment"), 6).as("containment"))
      .orderBy("needle_id", "haystack_id")
  }

  val containmentSweepSql: String =
    """WITH base AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |hay AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
      |  FROM base),
      |ndl AS (
      |  SELECT doc_id + 5000000 AS doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(h) - 2, 0) + 1),
      |         i -> h[i] || ' ' || h[i+1] || ' ' || h[i+2])) AS grams
      |  FROM (SELECT doc_id, list_slice(w, 1, 12) AS h
      |        FROM base WHERE doc_id IN (3, 17, 42))
      |  WHERE len(h) >= 3),
      |cand AS (
      |  SELECT DISTINCT n.doc_id AS nid, hg.doc_id AS hid
      |  FROM (SELECT doc_id, grams[1] AS g FROM ndl) n
      |  JOIN (SELECT doc_id, unnest(grams) AS g FROM hay) hg ON n.g = hg.g)
      |SELECT c.nid AS needle_id, c.hid AS haystack_id, 1.0 AS containment
      |FROM cand c JOIN ndl n ON n.doc_id = c.nid JOIN hay h ON h.doc_id = c.hid
      |WHERE len(list_intersect(n.grams, h.grams)) = len(n.grams)
      |ORDER BY needle_id, haystack_id""".stripMargin

  /** MinHash-LSH band table persisted as a parquet artifact and
    * searched after a round trip ([[Dedup.minhashBuildIndex]] →
    * write partitioned by band → read → [[Dedup.minhashSearchIndex]])
    * — the dedup-index-as-artifact lifecycle the cross-corpus variant
    * only simulates in-frame: the corpus is shingled/banded ONCE per
    * version, and each incoming batch probes the loaded band table.
    * Same provable-recall construction as q_dedup_incremental_fuzzy
    * (threshold 0.999 ⇔ identical shingle sets), so the oracle states
    * the pairs via canonical gram-set signatures; a hash match proves
    * the round-tripped artifact reproduces the in-frame search
    * exactly. */
  def dedupIndexPersisted(s: SparkSession, dir: String): DataFrame = {
    // the band-hash FORMAT version is part of the artifact path: an
    // index persisted under one fold is garbage to a probe using
    // another (zero collisions, silent empty result) — bumping the
    // tag on any fold change forces a rebuild
    val path = s"/tmp/graft_lsh_index_v2_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    if (!new java.io.File(s"$path/_INDEX_OK").exists()) {
      Dedup.minhashBuildIndex(d, "doc_id", "text", shingleN = 3, k = 32, bands = 8)
        .write.mode("overwrite").partitionBy("band").parquet(s"$path/bands")
      new java.io.File(s"$path/_INDEX_OK").createNewFile()
    }
    val index = s.read.parquet(s"$path/bands").select("id", "band", "bucket")
    val batch = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 4000000L).as("batch_id"), col("text"))
    Dedup.minhashSearchIndex(index, d, "doc_id", "text",
        batch, "batch_id", "text",
        shingleN = 3, k = 32, bands = 8, threshold = 0.999)
      .orderBy("corpus_id", "batch_id")
  }

  val dedupIndexPersistedSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |         md5(array_to_string(list_sort(list_distinct(
      |           list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))), chr(10))) AS sig,
      |         len(w) >= 3 AS ok
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents))
      |SELECT c.doc_id AS corpus_id, b.doc_id + 4000000 AS batch_id, 1.0 AS jaccard
      |FROM g c JOIN g b ON c.sig = b.sig AND b.doc_id % 10 = 0 AND c.ok AND b.ok
      |ORDER BY corpus_id, batch_id""".stripMargin

  /** SimHash near-dup pairs (hamming <= 3 over banded-LSH candidates).
    * xxhash64 has no DuckDB analog, so the SIGNATURES are staged as a
    * parquet artifact (the q_dedup_index_persisted pattern) and the
    * oracle restates everything DOWNSTREAM of the hash — 4-band
    * 16-bit LSH, the 1000-cap bucket drop (bounded_collect's NULL ⇔
    * count > cap is deterministic), hamming verify — over the staged
    * values. A hash match proves the banding/verify machinery exact;
    * the simhash bits themselves stay pinned by PipelineSpec units.
    * The stage path is keyed by (sanitized dir, content fingerprint)
    * with a _SUCCESS guard: staging runs once per dataset VERSION
    * (repeat timed runs skip the double simhash the r9 fixed path
    * re-billed every run), concurrent sessions on different datasets
    * write disjoint paths instead of clobbering one shared stage, and
    * a regenerated dataset re-stages instead of replaying stale
    * signatures. [[dedupSimhashSql]] reads the path of the LAST run in
    * this JVM — Verify dumps oracle SQL after running the queries, so
    * the driver's DuckDB pass always replays its own run's dataset. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val stage = Staging.pathFor(dir, "simhash_sigs_v2", "documents.parquet")
    Staging.publishOnce(stage) { tmp =>
      docsWithClones(s, dir).select(col("doc_id"),
          graft.functions.TextFunctions.simhash64(col("text")).as("sim"))
        .write.mode("overwrite").parquet(tmp)
    }
    dedupSimhashStage = stage
    Dedup.simhashNearDupPairs(docsWithClones(s, dir), "doc_id", "text",
        maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  @volatile private var dedupSimhashStage =
    Staging.pathFor("/root/testdata/sf0.01", "simhash_sigs_v2", "documents.parquet")

  /** DuckDB replay of [[Dedup.simhashNearDupPairs]] over the staged
    * signatures: same 4×16-bit banding (arithmetic `>>` + mask, as in
    * the JVM), same 2..1000 bucket-size window, same hamming<=3 verify.
    * A `def`: the stage path is resolved at dump time, after the query
    * ran and pinned [[dedupSimhashStage]] to its dataset's stage. */
  def dedupSimhashSql: String =
    s"""WITH s AS (SELECT doc_id, sim FROM '$dedupSimhashStage/*.parquet'),
      |b AS (
      |  SELECT s.doc_id, s.sim, r.range AS band,
      |         (s.sim >> (r.range::INT * 16)) & 65535 AS seg
      |  FROM s, range(4) r),
      |ok AS (
      |  SELECT band, seg FROM b GROUP BY band, seg
      |  HAVING count(*) BETWEEN 2 AND 1000),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, a.sim AS sim_a,
      |                  c.doc_id AS id_b, c.sim AS sim_b
      |  FROM b a
      |  JOIN ok o ON o.band = a.band AND o.seg = a.seg
      |  JOIN b c ON a.band = c.band AND a.seg = c.seg AND a.doc_id < c.doc_id)
      |SELECT id_a, id_b, bit_count(xor(sim_a, sim_b))::INT AS hamming
      |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** SimHash prefilter + exact verify — gives the hash-dependent
    * operator family a value oracle: the result is exactly the pairs
    * with identical whitespace-token multisets, which IS
    * DuckDB-expressible. The hamming<=3 variant above stays rows-only —
    * that radius genuinely needs the xxhash bit pattern. */
  def dedupSimhashExact(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashExactDupPairs(docsWithClones(s, dir), "doc_id", "text")
      .orderBy("id_a", "id_b")

  /** DuckDB replay: pairs with identical sorted raw-token lists (the
    * tokenizer is `\S+` over the raw text, not lowercased words). */
  val dedupSimhashExactSql: String =
    """WITH uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |), t AS (
      |  SELECT doc_id,
      |         md5(array_to_string(list_sort(regexp_extract_all(text, '\S+')), chr(10))) AS sig
      |  FROM uni)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM t a JOIN t b ON a.sig = b.sig AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  /** Embedding near-dup pairs at cosine >= 0.999 over hyperplane-LSH
    * buckets; clones guarantee recall, the oracle recomputes the same
    * cosine for the clone pairs. */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("embedding"))
    val uni = e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    Similarity.embeddingNearDupPairs(uni, "vec_id", "embedding",
        dim = 64, threshold = 0.999)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")
  }

  val embeddingNearDupSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT a.vec_id AS id_a, a.vec_id + 1000000 AS id_b,
      |       round(list_dot_product(a.v, b.v)
      |             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
      |             6) AS cos
      |FROM e a JOIN e b ON a.vec_id = b.vec_id
      |WHERE a.vec_id % 10 = 0
      |ORDER BY id_a, id_b""".stripMargin

  // ---- similarity search ----------------------------------------------

  /** Exact cosine top-5 for 8 probe vectors (the ANN ground-truth
    * baseline). */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 8)
    Similarity.bruteForceTopK(q, "vec_id", "embedding", e, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank").cast("int").as("rank"))
  }

  val annBruteForceSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id, v FROM e WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |         list_dot_product(q.v, e.v)
      |         / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
      |  FROM q CROSS JOIN e WHERE q.vec_id <> e.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Cosine radius search ([[Similarity.rangeSearch]]): every (query,
    * neighbor) pair with cosine ≥ 0.2 — the range-search complement of
    * q_ann_brute_force's top-k (no rank; the radius, not k, sets the
    * output). Same literal-probe single-job steady plan; the oracle
    * states the identical predicate over DuckDB's own dot products
    * (bit-parity of the double arithmetic is pinned by the top-k
    * family's hash matches). */
  def annRange(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 8)
    Similarity.rangeSearch(q, "vec_id", "embedding",
        e, "vec_id", "embedding", minCos = 0.2)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "neighbor_id")
  }

  val annRangeSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id, v FROM e WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |         list_dot_product(q.v, e.v)
      |         / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
      |  FROM q CROSS JOIN e WHERE q.vec_id <> e.vec_id)
      |SELECT query_id, neighbor_id, round(cos, 6) AS cos
      |FROM scored WHERE cos >= 0.2
      |ORDER BY query_id, neighbor_id""".stripMargin

  /** Label-filtered exact top-k ([[Similarity.bruteForceTopKFiltered]]):
    * neighbors restricted to the query's own label, with the equality
    * pushed pre-scoring as the join key — a hash equi join scores only
    * same-label pairs instead of cross-joining and discarding. The
    * oracle states the same predicate inside its join. */
  def annFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 8)
    Similarity.bruteForceTopKFiltered(q, "vec_id", "embedding", "label",
        e, "vec_id", "embedding", "label", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank").cast("int").as("rank"))
  }

  val annFilteredSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id, label, v FROM e WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |         list_dot_product(q.v, e.v)
      |         / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
      |  FROM q JOIN e ON q.label = e.label AND q.vec_id <> e.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** IVF-partitioned ANN (scale path), deterministic-anchor variant:
    * kmeansIters = 0 makes the anchors the first nCells corpus vectors
    * by id and every remaining step (assignment, probe, scoring, top-k)
    * plain cosine arithmetic — fully recomputable by the DuckDB oracle
    * with list_dot_product in the same fold order, so this approximate
    * operator still gets a rows+schema+hash check. The k-means-refined
    * anchor path is pinned separately by the recall scalatest
    * (approximate by construction — no value oracle possible). */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 8)
    Similarity.ivfTopK(q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4, kmeansIters = 0)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** DuckDB replay of the deterministic IVF: anchors = vec_id < 16,
    * assignment = argmax cosine (ties -> lower cell_id, matching the
    * (negcos, cell_id) struct sort), probe = top-4 cells per query,
    * then exact top-5 within probed cells. */
  val annIvfSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |anchors AS (  -- first 16 BY ORDER, as the JVM side takes them: 'vec_id < 16'
      |  -- would silently diverge on 1-based or gapped id spaces
      |  SELECT vec_id AS cell_id, v AS cv FROM e ORDER BY vec_id LIMIT 16),
      |assign_scored AS (
      |  SELECT e.vec_id, e.v, a.cell_id,
      |         list_dot_product(e.v, a.cv)
      |         / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(a.cv, a.cv))) AS c
      |  FROM e CROSS JOIN anchors a),
      |assigned AS (
      |  SELECT vec_id, v, cell_id AS cell FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |                                 ORDER BY c DESC, cell_id ASC) AS rn
      |    FROM assign_scored) WHERE rn = 1),
      |q AS (SELECT vec_id, v FROM e WHERE vec_id < 8),
      |probe_scored AS (
      |  SELECT q.vec_id AS qid, q.v AS qv, a.cell_id,
      |         list_dot_product(q.v, a.cv)
      |         / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(a.cv, a.cv))) AS c
      |  FROM q CROSS JOIN anchors a),
      |probed AS (
      |  SELECT qid, qv, cell_id AS cell FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      |                                 ORDER BY c DESC, cell_id ASC) AS rn
      |    FROM probe_scored) WHERE rn <= 4),
      |scored AS (
      |  SELECT p.qid AS query_id, s.vec_id AS neighbor_id,
      |         list_dot_product(p.qv, s.v)
      |         / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v))) AS cos
      |  FROM probed p JOIN assigned s ON p.cell = s.cell
      |  WHERE p.qid <> s.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ANN recall@k evaluation — the index-quality harness every
    * approximate similarity deployment needs: per query, the fraction
    * of the exact brute-force top-k ([[annBruteForce]]) that the IVF
    * index ([[annIvf]]) retrieved. Both legs are deterministic here, so
    * even this EVALUATION is value-oracled — the DuckDB oracle recomputes
    * both result sets and the same per-query overlap. Shape: the two
    * k-bounded result sets join on (query, neighbor) — query-grain
    * frames throughout, nothing corpus-sized after the legs
    * themselves. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val bf = annBruteForce(s, dir).select(col("query_id"), col("neighbor_id"))
    val iv = annIvf(s, dir).select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1L))
    bf.join(iv, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("__k"), sum(coalesce(col("__hit"), lit(0L))).as("n_common"))
      .select(col("query_id"), col("n_common"),
        round(col("n_common").cast("double") / col("__k"), 6).as("recall"))
      .orderBy("query_id")
  }

  val annRecallSql: String =
    s"""WITH bf AS (
       |  SELECT query_id, neighbor_id FROM ($annBruteForceSql)),
       |iv AS (
       |  SELECT query_id, neighbor_id FROM ($annIvfSql))
       |SELECT bf.query_id,
       |       CAST(COUNT(iv.neighbor_id) AS BIGINT) AS n_common,
       |       round(COUNT(iv.neighbor_id) / CAST(COUNT(*) AS DOUBLE), 6) AS recall
       |FROM bf LEFT JOIN iv
       |  ON iv.query_id = bf.query_id AND iv.neighbor_id = bf.neighbor_id
       |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin

  /** IVF index persisted as a table artifact and searched after a
    * parquet round trip ([[Similarity.ivfBuildIndex]] →
    * write/read → [[Similarity.ivfSearchIndex]]) — the index-as-
    * artifact lifecycle: centroids + cell assignments build once per
    * corpus version, the assigned table writes PARTITIONED BY cell so
    * every probe is a partition-pruned read, and query batches never
    * re-run assignment. Same deterministic anchors and therefore the
    * SAME oracle as q_ann_ivf: a hash match proves the round-tripped
    * artifacts reproduce the in-memory search exactly. */
  def annIvfPersisted(s: SparkSession, dir: String): DataFrame = {
    // format-versioned like the LSH index path: a layout/fold change in
    // ivfBuildIndex must force a rebuild, not silently probe stale
    // cached artifacts from the previous build
    val path = s"/tmp/graft_ivf_index_v2_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    if (!new java.io.File(s"$path/_INDEX_OK").exists()) {
      val e = embs(s, dir)
      val (anchors, assigned) = Similarity.ivfBuildIndex(
        e, "vec_id", "embedding", nCells = 16, kmeansIters = 0)
      anchors.write.mode("overwrite").parquet(s"$path/anchors")
      assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/assigned")
      new java.io.File(s"$path/_INDEX_OK").createNewFile()
    }
    val anchors = s.read.parquet(s"$path/anchors")
    val assigned = s.read.parquet(s"$path/assigned")
    val q = embs(s, dir).filter(col("vec_id") < 8)
    Similarity.ivfSearchIndex(q, "vec_id", "embedding",
        anchors, assigned, "vec_id", "embedding", k = 5, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  // ---- multimodal -------------------------------------------------------

  /** Binary-column plumbing: payload = utf-8 bytes of the text (stand-in
    * for an image blob), metadata + stub decode verified end-to-end. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        Multimodal.metadataOf(col("payload")).as("m"),
        Multimodal.stubDecodeImage(col("payload")).as("img"))
      .select(col("doc_id"),
        col("m.size_bytes").as("size_bytes"),
        col("m.checksum").as("checksum"),
        col("img.width").as("width"),
        col("img.height").as("height"))
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
      |       md5(text) AS checksum,
      |       octet_length(encode(text)) % 640 + 16 AS width,
      |       (octet_length(encode(text)) * 7) % 480 + 16 AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Perceptual average-hash over the stub tile
    * ([[Multimodal.stubAverageHash]]): 64 evenly sampled payload bytes
    * thresholded by integer comparison against the tile sum — the
    * image-dedup fingerprint with the decode stubbed, everything else
    * real. Oracle replays the identical byte sampling (on the hex
    * encoding — DuckDB 1.0 has no BLOB substring, same trick as
    * q_frame_sample) and the same integer threshold. */
  def imagePhash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(length(col("text")) > 0)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("phash_bits", Multimodal.stubAverageHash(col("payload")))
      .select(col("doc_id"), col("phash_bits"),
        length(translate(col("phash_bits"), "0", "")).cast("long").as("n_bits_set"))
      // r17: no trailing orderBy — determinism-only (the gate compares
      // sorted), and the range-sampling pass re-executed the expensive
      // per-row codec work for every row (guide §2.4; OPTIMIZATION_r17 §5)

  val imagePhashSql: String =
    """WITH p AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS len
      |  FROM documents WHERE length(text) > 0),
      |px AS (
      |  SELECT doc_id, k,
      |         (strpos('0123456789ABCDEF',
      |            substring(h, CAST(trunc(k * (len - 1) / 63.0) AS INT) * 2 + 1, 1)) - 1) * 16
      |         + (strpos('0123456789ABCDEF',
      |            substring(h, CAST(trunc(k * (len - 1) / 63.0) AS INT) * 2 + 2, 1)) - 1) AS v
      |  FROM p, UNNEST(range(0, 64)) AS t(k)),
      |s AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY doc_id)
      |SELECT px.doc_id,
      |       string_agg(CASE WHEN v * 64 > sv THEN '1' ELSE '0' END, '' ORDER BY k)
      |         AS phash_bits,
      |       CAST(sum(CASE WHEN v * 64 > sv THEN 1 ELSE 0 END) AS BIGINT) AS n_bits_set
      |FROM px JOIN s USING (doc_id)
      |GROUP BY px.doc_id ORDER BY doc_id""".stripMargin

  /** Image near-dup pairs: the [[imagePhash]] fingerprints paired by
    * [[Multimodal.phashNearDupPairs]] pigeonhole band blocking —
    * 8 bands of 8 bits, so every pair within hamming distance 7 is
    * found by an equi-join on a whole band (exact recall, a theorem
    * not a probability) and no all-pairs comparison ever plans. The
    * oracle replays the identical fingerprint, banding (bitstring →
    * BIGINT per 8-bit slice), blocking join and bit_count(xor)
    * verification. */
  def phashNearDup(s: SparkSession, dir: String): DataFrame =
    Multimodal.phashNearDupPairs(
        docs(s, dir)
          .filter(length(col("text")) > 0)
          .withColumn("phash_bits",
            Multimodal.stubAverageHash(col("text").cast("binary")))
          .select(col("doc_id"), col("phash_bits")),
        "doc_id", "phash_bits", bands = 8, maxDist = 7)
      .orderBy("id_a", "id_b")

  val phashNearDupSql: String =
    """WITH p AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS len
      |  FROM documents WHERE length(text) > 0),
      |px AS (
      |  SELECT doc_id, k,
      |         (strpos('0123456789ABCDEF',
      |            substring(h, CAST(trunc(k * (len - 1) / 63.0) AS INT) * 2 + 1, 1)) - 1) * 16
      |         + (strpos('0123456789ABCDEF',
      |            substring(h, CAST(trunc(k * (len - 1) / 63.0) AS INT) * 2 + 2, 1)) - 1) AS v
      |  FROM p, UNNEST(range(0, 64)) AS t(k)),
      |s AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY doc_id),
      |ph AS (
      |  SELECT px.doc_id,
      |         string_agg(CASE WHEN v * 64 > sv THEN '1' ELSE '0' END, '' ORDER BY k) AS bits
      |  FROM px JOIN s USING (doc_id) GROUP BY px.doc_id),
      |bi AS (
      |  SELECT doc_id, t.i AS band_idx,
      |         (substring(bits, t.i * 8 + 1, 8)::BIT)::BIGINT AS band_val
      |  FROM ph, UNNEST(range(0, 8)) AS t(i)),
      |pr AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bi a JOIN bi b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |   AND a.doc_id < b.doc_id)
      |SELECT * FROM (
      |  SELECT pr.id_a, pr.id_b,
      |         CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT) AS hamming
      |  FROM pr
      |  JOIN bi x ON x.doc_id = pr.id_a
      |  JOIN bi y ON y.doc_id = pr.id_b AND y.band_idx = x.band_idx
      |  GROUP BY pr.id_a, pr.id_b)
      |WHERE hamming <= 7 ORDER BY id_a, id_b""".stripMargin

  /** Token-budget shard packing (training-data export): documents
    * packed into ~2000-token shards in doc_id order via the
    * distributed prefix sum in [[graft.functions.Packing]]. The oracle
    * states the same prefix arithmetic as one global window — DuckDB
    * can afford that at sf; the Spark side must not (bounded slices +
    * #partitions-row offset window instead). */
  def shardPack(s: SparkSession, dir: String): DataFrame =
    graft.functions.Packing.packShards(
        docs(s, dir).select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 2000L)
      .select(col("doc_id"), col("n_tokens"), col("shard_id"))
      .orderBy("doc_id")

  val shardPackSql: String =
    """SELECT doc_id, n_tokens,
      |       CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0)
      |            AS BIGINT) AS shard_id
      |FROM (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Curriculum ordering: a dense global rank of the corpus by
    * (n_tokens DESC, doc_id) — the "schedule long documents first"
    * export order — WITHOUT a global window: the rank is
    * [[graft.functions.Packing.withDenseIndex]]'s distributed prefix
    * sum over a fixed-width composite sort key (integer fields only,
    * so the key and hence the rank are bit-identical cross-engine).
    * The oracle is the ROW_NUMBER the operator deliberately avoids —
    * at 100 TB that single-partition sort is the difference. */
  def curriculumRank(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("n_tokens"))
    // ascending key = (n_tokens desc, doc_id asc); widths cover the domains
    val keyed = d.withColumn("__key",
      format_string("%010d-%012d", lit(2000000000L) - col("n_tokens"), col("doc_id")))
    graft.functions.Packing.withDenseIndex(keyed, "__key", "rank")
      .select(col("doc_id"), col("n_tokens"), col("rank"))
      .orderBy("doc_id")
  }

  val curriculumRankSql: String =
    """SELECT doc_id, n_tokens,
      |       ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rank
      |FROM (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Training-corpus JSONL export, end to end: pack docs into
    * ~2000-token shards, WRITE them as shard-partitioned JSONL (the
    * hand-off format for tokenizer/training jobs), then build the
    * manifest by READING THE EXPORT BACK — n_docs / n_tokens / an
    * order-insensitive content checksum (Σ md5-prefix ints, exact in
    * integers) per shard. The oracle recomputes the same manifest from
    * the source table, so a hash match proves the written shards
    * round-trip the text byte-for-byte (JSON escaping included) and no
    * doc was lost or duplicated. */
  def exportJsonl(s: SparkSession, dir: String): DataFrame = {
    val out = s"/tmp/graft_export_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.functions.Packing.packShards(
        docs(s, dir).select(col("doc_id"), col("text"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 2000L)
      .write.partitionBy("shard_id").mode("overwrite").json(out)
    val manifest = s.read.schema("doc_id LONG, text STRING, n_tokens LONG").json(out)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("shard_id")
      .cache()
    manifest.count() // materialize off the export files...
    TmpSweeper.deleteRec(new java.io.File(out)) // ...so the corpus copy can go
    manifest
  }

  val exportJsonlSql: String =
    """WITH packed AS (
      |  SELECT doc_id, text, n_tokens,
      |         CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0)
      |              AS BIGINT) AS shard_id
      |  FROM (SELECT doc_id, text, len(regexp_extract_all(text, '\S+')) AS n_tokens
      |        FROM documents))
      |SELECT shard_id, COUNT(*) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(SUM(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS checksum
      |FROM packed GROUP BY shard_id ORDER BY shard_id""".stripMargin

  /** TFRecord / tf.train.Example export round-trip
    * ([[graft.functions.TfRecord]]): write the documents table as 4
    * TFRecord shards — hand-rolled framing (masked crc32c per record)
    * and Example protos — then READ THE SHARDS BACK with the streaming
    * parser (both crcs verified per record) and return the decoded
    * rows. The oracle is the source projection itself, so a hash match
    * proves the export round-trips every value byte-for-byte through
    * the interchange format every TF data pipeline consumes, and that
    * no record was lost, duplicated, or torn across shard boundaries. */
  def tfrecordRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = s"/tmp/graft_tfrec_${java.util.UUID.randomUUID().toString.take(8)}"
    val src = docs(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    graft.functions.TfRecord.writeShards(src, out, numShards = 4)
    val back = graft.functions.TfRecord.readShards(s, out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType))))
      .orderBy("doc_id")
      .cache()
    back.count() // materialize off the shard files...
    TmpSweeper.deleteRec(new java.io.File(out)) // ...so the export copy can go
    back
  }

  val tfrecordRoundtripSql: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** WebDataset (ustar tar shard) export round-trip
    * ([[graft.functions.WebDataset]]): each document becomes the
    * canonical two-member sample — `<doc_id>.txt` with the raw text,
    * `<doc_id>.json` with the metadata — across 4 tar shards, then the
    * shards are READ BACK (header checksums verified, samples grouped
    * by adjacency) and the json part re-parsed. Oracle = the source
    * projection: a hash match proves the tar bytes round-trip text and
    * metadata exactly through the format multimodal pipelines consume.
    * PureSpec additionally pins interop against the SYSTEM tar in both
    * directions. */
  def webdatasetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = s"/tmp/graft_wds_${java.util.UUID.randomUUID().toString.take(8)}"
    val src = docs(s, dir).select(col("doc_id"), col("text"),
      to_json(struct(col("lang"), col("source"), col("n_chars"))).as("meta"))
    graft.functions.WebDataset.writeShards(src, out, numShards = 4,
      keyCol = "doc_id", parts = Seq("txt" -> "text", "json" -> "meta"))
    val metaSchema = "lang STRING, source STRING, n_chars LONG"
    val back = graft.functions.WebDataset.readShards(s, out, Seq("txt", "json"))
      .select(col("key").cast("long").as("doc_id"), col("txt").as("text"),
        from_json(col("json"), org.apache.spark.sql.types.StructType.fromDDL(metaSchema))
          .as("m"))
      .select(col("doc_id"), col("text"), col("m.lang").as("lang"),
        col("m.source").as("source"), col("m.n_chars").as("n_chars"))
      .orderBy("doc_id")
      .cache()
    back.count() // materialize off the shard files...
    TmpSweeper.deleteRec(new java.io.File(out)) // ...so the export copy can go
    back
  }

  val webdatasetRoundtripSql: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** REAL image decode end to end ([[Multimodal.ImageIoDecoder]] — the
    * JDK's own JPEG/PNG/BMP codecs, no external library): each document
    * synthesizes a deterministic image (geometry keyed by doc_id, the
    * codec rotating png/jpeg/bmp by doc_id % 3) ENCODED with
    * `javax.imageio`, then the batched decoder reads the bytes back and
    * reports dimensions/channels plus the real pixel average-hash. The
    * oracle recomputes the geometry arithmetic — a hash match proves
    * real bytes of three codecs round-tripped the decode plumbing (any
    * decode failure nulls the dims and breaks the match). */
  def imageDecode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // spread the per-row ENCODE across cores: the source is one parquet
    // row group = one task, and synthesizing 10x data single-threaded
    // was the whole wall at scale (ScaleCheck caught it at 4-15x)
    val src = docs(s, dir).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism)
    val withPayload = {
      val outSchema = StructType(src.schema.fields :+ StructField("payload", BinaryType))
      src.mapPartitions { it =>
        it.map { r =>
          val id = r.getAs[Long](0)
          val w = (id % 64 + 8).toInt
          val h = (id % 48 + 8).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // deterministic per-pixel pattern keyed by the doc id
              img.setRGB(x, y, (((x * 37 + id) % 256).toInt << 16) |
                (((y * 53 + id * 7) % 256).toInt << 8) | ((x + y) % 256))
              x += 1
            }
            y += 1
          }
          val fmt = (id % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "bmp" }
          Multimodal.disableImageIoDiskCache() // else: a temp FILE per encode
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          org.apache.spark.sql.Row(id, bos.toByteArray)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema)).toDF()
    }
    Multimodal.decodeBatched(withPayload, "payload", new Multimodal.ImageIoDecoder,
        numPartitions = Some(s.sparkContext.defaultParallelism))
      .select(col("doc_id"), col("width"), col("height"), col("channels"))
      // r17: no trailing orderBy — determinism-only (the gate compares
      // sorted), and the range-sampling pass re-executed the expensive
      // per-row codec work for every row (guide §2.4; OPTIMIZATION_r17 §5)
  }

  val imageDecodeSql: String =
    """SELECT doc_id, doc_id % 64 + 8 AS width, doc_id % 48 + 8 AS height,
      |       3 AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** REAL audio decode end to end ([[Multimodal.WavPcmDecoder]] — the
    * RIFF/WAVE PCM container hand-parsed from its public layout): each
    * document synthesizes a mono 16-bit 8 kHz sine ENCODED by the JDK's
    * `javax.sound.sampled` writer (an independent encoder — the decoder
    * under test never sees its own output format assumptions), and the
    * decoder reports the header facts the oracle recomputes
    * arithmetically. RMS/zero-crossing features are spec-pinned
    * (PipelineSpec) — they are not SQL-expressible. */
  def audioDecode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // same encode-parallelism note as imageDecode
    val src = docs(s, dir).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism)
    val withPayload = {
      val outSchema = StructType(src.schema.fields :+ StructField("payload", BinaryType))
      src.mapPartitions { it =>
        it.map { r =>
          val id = r.getAs[Long](0)
          val n = (id % 4000 + 100).toInt
          val pcm = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val v = (math.sin((i + id % 17) * 0.12) * 9000).toShort
            pcm(2 * i) = v.toByte
            pcm(2 * i + 1) = (v >> 8).toByte
            i += 1
          }
          // canonical 44-byte PCM WAV header + data, written directly:
          // AudioSystem.write pays a provider lookup per call, measured
          // dominating the synth at corpus row counts; the JDK-encoder
          // cross-check (our decoder vs AudioSystem's writer) stays
          // pinned in PipelineSpec
          val wav = new Array[Byte](44 + pcm.length)
          val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
            .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1).putInt(8000).putInt(16000)
            .putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(pcm.length)
            .put(pcm)
          org.apache.spark.sql.Row(id, wav)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema)).toDF()
    }
    Multimodal.decodeBatched(withPayload, "payload", new Multimodal.WavPcmDecoder,
        numPartitions = Some(s.sparkContext.defaultParallelism))
      .select(col("doc_id"), col("sample_rate"), col("channels"), col("bits"),
        col("n_frames"), col("duration_ms"))
      // r17: no trailing orderBy — determinism-only (the gate compares
      // sorted), and the range-sampling pass re-executed the expensive
      // per-row codec work for every row (guide §2.4; OPTIMIZATION_r17 §5)
  }

  val audioDecodeSql: String =
    """SELECT doc_id, 8000 AS sample_rate, 1 AS channels, 16 AS bits,
      |       doc_id % 4000 + 100 AS n_frames,
      |       (doc_id % 4000 + 100) * 1000 // 8000 AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  /** REAL image resize end to end ([[Multimodal.ImageResizer]]):
    * encode (doc_id-keyed geometry, rotating codecs) → area-average
    * resize to fit 16×12 → RE-DECODE the resized PNG payload with
    * [[Multimodal.ImageIoDecoder]]. The oracle recomputes the
    * fit-within-box floor arithmetic — a hash match proves the resized
    * bytes are a VALID image of exactly the contract geometry (both
    * decode steps run real codecs; IEEE double scale math is identical
    * in Spark and DuckDB). */
  def imageResize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val src = docs(s, dir).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism)
    val withPayload = {
      val outSchema = StructType(src.schema.fields :+ StructField("payload", BinaryType))
      src.mapPartitions { it =>
        it.map { r =>
          val id = r.getAs[Long](0)
          val w = (id % 64 + 8).toInt
          val h = (id % 48 + 8).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, (((x * 37 + id) % 256).toInt << 16) |
                (((y * 53 + id * 7) % 256).toInt << 8) | ((x + y) % 256))
              x += 1
            }
            y += 1
          }
          val fmt = (id % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "bmp" }
          Multimodal.disableImageIoDiskCache()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          org.apache.spark.sql.Row(id, bos.toByteArray)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema)).toDF()
    }
    val resized = Multimodal.decodeBatched(withPayload, "payload",
        new Multimodal.ImageResizer(16, 12),
        numPartitions = Some(s.sparkContext.defaultParallelism))
      .select(col("doc_id"), col("resized"))
    Multimodal.decodeBatched(resized, "resized", new Multimodal.ImageIoDecoder,
        numPartitions = Some(s.sparkContext.defaultParallelism))
      .select(col("doc_id"), col("width"), col("height"), col("channels"))
      // r17: no trailing orderBy — determinism-only (the gate compares
      // sorted), and the range-sampling pass re-executed the expensive
      // per-row codec work for every row (guide §2.4; OPTIMIZATION_r17 §5)
  }

  val imageResizeSql: String =
    """SELECT doc_id,
      |       CAST(floor((doc_id % 64 + 8) *
      |         least(16.0 / (doc_id % 64 + 8), 12.0 / (doc_id % 48 + 8), 1.0))
      |         AS BIGINT) AS width,
      |       CAST(floor((doc_id % 48 + 8) *
      |         least(16.0 / (doc_id % 64 + 8), 12.0 / (doc_id % 48 + 8), 1.0))
      |         AS BIGINT) AS height,
      |       3 AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Context-window assignment ([[graft.functions.Packing.contextWindows]]):
    * each doc's interval in the 512-token window slicing of the
    * doc_id-ordered token stream — documents cross window boundaries,
    * the sequence-construction dual of whole-doc shard packing. Oracle
    * restates the prefix arithmetic as one global window. */
  def contextWindowsQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Packing.contextWindows(
        docs(s, dir).select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", windowTokens = 512L)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        col("first_window"), col("last_window"), col("n_windows"))
      .orderBy("doc_id")

  val contextWindowsSql: String =
    """WITH n AS (
      |  SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, n_tokens,
      |         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
      |  FROM n)
      |SELECT doc_id, n_tokens, CAST(st AS BIGINT) AS start_offset,
      |       CAST(floor(st / 512.0) AS BIGINT) AS first_window,
      |       CAST(floor((st + n_tokens - 1) / 512.0) AS BIGINT) AS last_window,
      |       CAST(floor((st + n_tokens - 1) / 512.0) - floor(st / 512.0) + 1 AS BIGINT)
      |         AS n_windows
      |FROM p WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary: top-100 bigrams by document frequency. */
  def vocabTopK(s: SparkSession, dir: String): DataFrame =
    TF.topKNgrams(docs(s, dir).select(col("text")), "text", n = 2, k = 100)
      .orderBy(desc("doc_freq"), asc("ngram"))

  val vocabTopKSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
      |                i -> w[i] || ' ' || w[i+1]))) AS ngram
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      |        FROM documents))
      |SELECT ngram, count(*) AS doc_freq FROM g GROUP BY 1
      |ORDER BY doc_freq DESC, ngram LIMIT 100""".stripMargin

  /** Count-min heavy-hitter tokens ([[graft.functions.Sketch]]):
    * the fixed-memory hot-key detector — a depth×width counter table
    * built in one map-side-combinable pass (sketch-sized on the
    * shuffle regardless of corpus size or skew), probed at
    * vocabulary grain. `exact` rides along so the overestimate-only
    * bound is visible in the result; threshold filtering has no false
    * negatives by construction. Oracle replays the md5-derived bucket
    * arithmetic, the cell counts and the row-minimum exactly. */
  def countMinHH(s: SparkSession, dir: String): DataFrame =
    graft.functions.Sketch.countMinHeavyHitters(
        docs(s, dir).select(
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token")),
        "token", depth = 4, width = 1024, threshold = 300L)
      .select(col("item").as("token"), col("est"), col("exact"))
      .orderBy("token")

  val countMinHHSql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      |  FROM documents),
      |cells AS (
      |  SELECT r.r AS rw,
      |         CAST('0x' || substr(md5('cm' || CAST(r.r AS VARCHAR) || ':' || token), 1, 8)
      |              AS BIGINT) % 1024 AS bucket,
      |         count(*) AS cnt
      |  FROM toks, UNNEST(range(0, 4)) AS r(r)
      |  GROUP BY 1, 2),
      |exact AS (SELECT token, count(*) AS exact FROM toks GROUP BY 1),
      |probe AS (
      |  SELECT token, exact, r.r AS rw,
      |         CAST('0x' || substr(md5('cm' || CAST(r.r AS VARCHAR) || ':' || token), 1, 8)
      |              AS BIGINT) % 1024 AS bucket
      |  FROM exact, UNNEST(range(0, 4)) AS r(r))
      |SELECT token, CAST(min(cnt) AS BIGINT) AS est, CAST(exact AS BIGINT) AS exact
      |FROM probe JOIN cells USING (rw, bucket)
      |GROUP BY token, exact
      |HAVING min(cnt) >= 300
      |ORDER BY token""".stripMargin

  /** Gopher-rule quality flags per document (flags cast to 0/1 ints so
    * the cross-engine dtype comparison is unambiguous). */
  def qualityGopher(s: SparkSession, dir: String): DataFrame = {
    val flagged = docs(s, dir).select(col("doc_id"), TF.gopherFlags(col("text")).as("g"))
    val names = Seq("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
      "ok_alpha_ratio", "ok_stopwords", "pass")
    flagged.select(col("doc_id") +: names.map(n => col(s"g.$n").cast("int").as(n)): _*)
      .orderBy("doc_id")
  }

  val qualityGopherSql: String =
    """SELECT doc_id,
      |       CAST(n_tok BETWEEN 50 AND 100000 AS INT) AS ok_word_count,
      |       CAST(mean_len BETWEEN 3.0 AND 10.0 AS INT) AS ok_mean_word_len,
      |       CAST(sym <= n_tok * 0.1 AS INT) AS ok_symbol_ratio,
      |       CAST(CASE WHEN n_tok > 0
      |                 THEN alpha_tok / CAST(n_tok AS DOUBLE) >= 0.8
      |                 ELSE FALSE END AS INT) AS ok_alpha_ratio,
      |       CAST(stop_d >= 2 AS INT) AS ok_stopwords,
      |       CAST((n_tok BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
      |            AND (sym <= n_tok * 0.1)
      |            AND (CASE WHEN n_tok > 0
      |                      THEN alpha_tok / CAST(n_tok AS DOUBLE) >= 0.8
      |                      ELSE FALSE END)
      |            AND (stop_d >= 2) AS INT) AS pass
      |FROM (
      |  SELECT doc_id,
      |         len(toks) AS n_tok,
      |         CASE WHEN len(w) > 0
      |              THEN list_sum(list_transform(w, x -> len(x))) / CAST(len(w) AS DOUBLE)
      |              ELSE 0.0 END AS mean_len,
      |         len(regexp_extract_all(text, '[#…]')) AS sym,
      |         len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_tok,
      |         len(list_distinct(regexp_extract_all(lower(text),
      |             '\b(the|and|of|to|a|in|is|it|for|on)\b'))) AS stop_d
      |  FROM (SELECT doc_id, text,
      |               regexp_extract_all(text, '\S+') AS toks,
      |               regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** C4-style line cleaning over synthetic multi-line "pages" (5
    * consecutive docs per page, deterministic terminal punctuation —
    * the corpus itself is single-line, so pages make the line rules
    * observable). */
  def c4Clean(s: SparkSession, dir: String): DataFrame = {
    val lined = docs(s, dir).select(
      (col("doc_id") / 5).cast("long").as("page_id"),
      col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0, lit("."))
          .when(col("doc_id") % 3 === 1, lit(""))
          .otherwise(lit(" !"))).as("line"))
    val pages = lined.groupBy("page_id").agg(
      array_join(
        transform(array_sort(collect_list(struct(col("doc_id"), col("line")))),
          x => x.getField("line")), "\n").as("page"))
    pages.select(
        col("page_id"),
        size(split(col("page"), "\n")).cast("long").as("n_lines"),
        TF.cleanLines(col("page"), minWords = 5).as("cleaned"))
      .withColumn("n_kept",
        when(length(col("cleaned")) === 0, lit(0L))
          .otherwise(size(split(col("cleaned"), "\n")).cast("long")))
      .select(col("page_id"), col("n_lines"), col("n_kept"), col("cleaned"))
      .orderBy("page_id")
  }

  val c4CleanSql: String =
    """WITH lined AS (
      |  SELECT doc_id // 5 AS page_id, doc_id,
      |         text || CASE WHEN doc_id % 3 = 0 THEN '.'
      |                      WHEN doc_id % 3 = 1 THEN ''
      |                      ELSE ' !' END AS line
      |  FROM documents),
      |pages AS (
      |  SELECT page_id, string_agg(line, chr(10) ORDER BY doc_id) AS page
      |  FROM lined GROUP BY page_id),
      |cl AS (
      |  SELECT page_id,
      |         len(string_split(page, chr(10))) AS n_lines,
      |         array_to_string(list_filter(string_split(page, chr(10)),
      |             l -> regexp_matches(l, '[.!?"]\s*$')
      |                  AND len(regexp_extract_all(l, '\S+')) >= 5), chr(10)) AS cleaned
      |  FROM pages)
      |SELECT page_id, n_lines,
      |       CASE WHEN cleaned = '' THEN 0
      |            ELSE len(string_split(cleaned, chr(10))) END AS n_kept,
      |       cleaned
      |FROM cl ORDER BY page_id""".stripMargin

  /** Deterministic domain-mixture sampling: per-source weights
    * (derived from the source index so both engines state them
    * closed-form), md5-hash keep decision — the sample is exactly
    * replayable by the oracle. */
  def mixtureSampleQ(s: SparkSession, dir: String): DataFrame = {
    val weighted = docs(s, dir).withColumn("w",
      ((regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") % 5) + 1)
        .cast("double") / 10.0)
    Dedup.mixtureSample(weighted, col("doc_id"), col("w"), salt = "mix")
      .select(col("doc_id"), col("source"), round(col("w"), 1).as("weight"))
      .orderBy("doc_id")
  }

  val mixtureSampleSql: String =
    """SELECT doc_id, source, round(w, 1) AS weight
      |FROM (SELECT doc_id, source,
      |             ((CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 5) + 1) / 10.0 AS w
      |      FROM documents)
      |WHERE w >= 1.0
      |   OR substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)
      |      < printf('%08x', CAST(floor(w * 4294967296.0) AS BIGINT))
      |ORDER BY doc_id""".stripMargin

  /** Connected components over a near-dup spanning-chain edge list:
    * clone CLUSTERS (every 10th doc cloned at +1e6, every 20th
    * additionally at +2e6) fingerprint-grouped, but each doc linked
    * only to its predecessor in the group — pairs under-connect, the
    * component closure must recover the full clusters transitively.
    * The oracle states reachability as a recursive CTE. */
  def componentsQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val uni = d
      .unionByName(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val fp = uni.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val edges = fp.withColumn("prev", lag("doc_id", 1).over(w))
      .filter(col("prev").isNotNull)
    Components.connectedComponents(edges, "prev", "doc_id").orderBy("id")
  }

  val componentsSql: String =
    """WITH RECURSIVE uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 20 = 0
      |), fp AS (
      |  SELECT doc_id,
      |         md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'),
      |                                 ' +', ' ', 'g'))) AS f
      |  FROM uni
      |), e AS (
      |  SELECT prev AS u, doc_id AS v
      |  FROM (SELECT doc_id, lag(doc_id) OVER (PARTITION BY f ORDER BY doc_id) AS prev
      |        FROM fp)
      |  WHERE prev IS NOT NULL
      |), sym AS (
      |  SELECT u, v FROM e UNION SELECT v, u FROM e
      |), lbl AS (
      |  SELECT u AS id, u AS comp FROM sym
      |  UNION
      |  SELECT s.v AS id, l.comp AS comp FROM lbl l JOIN sym s ON s.u = l.id
      |)
      |SELECT id, min(comp) AS component FROM lbl GROUP BY id ORDER BY id""".stripMargin

  /** Per-source corpus statistics with exact percentiles — the corpus
    * reporting step of a data pipeline (doc counts, token-length
    * distribution per domain). Exact `percentile` buffers one group's
    * values; per-SOURCE groups are few and bounded — at 100 TB swap in
    * approx_percentile (t-digest, mergeable) for the same shape. */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), TF.tokenCount(col("text")).cast("double").as("n"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        round(avg("n"), 4).as("mean_tokens"),
        round(expr("percentile(n, 0.5)"), 4).as("p50_tokens"),
        round(expr("percentile(n, 0.9)"), 4).as("p90_tokens"),
        round(expr("percentile(n, 0.99)"), 4).as("p99_tokens"))
      .orderBy("source")

  val corpusStatsSql: String =
    """SELECT source, count(*) AS n_docs, round(avg(n), 4) AS mean_tokens,
      |       round(quantile_cont(n, 0.5), 4) AS p50_tokens,
      |       round(quantile_cont(n, 0.9), 4) AS p90_tokens,
      |       round(quantile_cont(n, 0.99), 4) AS p99_tokens
      |FROM (SELECT source, CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n
      |      FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-10 words by document frequency — the vocab-coverage check run
    * before committing to a tokenizer vocabulary. Composition shape:
    * top-k vocab (partial count + TakeOrdered) broadcast-joined against
    * the exploded word stream, re-aggregated per doc — the vocab side
    * is k rows, so the join never shuffles the corpus. */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    val vocab = TF.topKNgrams(docs(s, dir).select(col("text")), "text", n = 1, k = 10)
      .select(col("ngram").as("w")).withColumn("__in", lit(1))
    docs(s, dir).select(col("doc_id"), explode(TF.words(col("text"))).as("w"))
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(coalesce(col("__in"), lit(0))).as("n_in_vocab"))
      .select(col("doc_id"), col("n_words"),
        round(lit(1.0) - col("n_in_vocab").cast("double") / col("n_words").cast("double"), 4)
          .as("oov_rate"))
      .orderBy("doc_id")
  }

  val oovRateSql: String =
    """WITH vocab AS (
      |  SELECT w FROM (
      |    SELECT doc_id,
      |           unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS w
      |    FROM documents) g
      |  GROUP BY w ORDER BY count(*) DESC, w LIMIT 10
      |), ex AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents)
      |SELECT doc_id, count(*) AS n_words,
      |       round(1.0 - CAST(count(v.w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS oov_rate
      |FROM ex LEFT JOIN vocab v USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** TF-IDF term weighting (tf = in-doc frequency fraction, idf =
    * ln(N/df) over per-doc-distinct document frequency) for the first
    * 50 docs' terms. Scale shape: term stats are two hash aggregations
    * over the exploded word stream (map-side combined); the df table
    * joins back on the word — vocabulary-sized, so AQE broadcasts it
    * when small and shuffle-joins the (word)-keyed sides when not. Per
    * (doc, word) output rows, deterministically ordered — no top-k cut
    * on a float score, so cross-engine libm ulp differences are
    * absorbed by rounding instead of flipping a ranking. */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // N as a broadcast 1-row frame keeps the whole operator LAZY (an
    // eager d.count() here would run a corpus scan at every
    // plan-construction site); df derives from the tf aggregate —
    // its (doc_id, w) rows ARE the distinct pairs — so the corpus is
    // exploded once, not once per branch.
    val nDf = d.agg(count(lit(1)).cast("double").as("__n"))
    val wordsOf = d.select(col("doc_id"), explode(TF.words(col("text"))).as("w"))
    val tfCounts = wordsOf.groupBy("doc_id", "w").agg(count(lit(1)).as("tf_cnt"))
    val tf = tfCounts
      .withColumn("doc_len", sum(col("tf_cnt")).over(Window.partitionBy("doc_id")))
    val df = tfCounts.groupBy("w").agg(count(lit(1)).as("df_cnt"))
    tf.join(df, "w").crossJoin(broadcast(nDf))
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("w").as("term"), col("tf_cnt"), col("df_cnt"),
        round((col("tf_cnt").cast("double") / col("doc_len").cast("double")) *
          log(col("__n") / col("df_cnt").cast("double")), 4).as("tfidf"))
      .orderBy("doc_id", "term")
  }

  val tfidfSql: String =
    """WITH ex AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, w, count(*) AS tf_cnt,
      |         sum(count(*)) OVER (PARTITION BY doc_id) AS doc_len
      |  FROM ex GROUP BY doc_id, w),
      |df AS (
      |  SELECT w, count(*) AS df_cnt FROM (SELECT DISTINCT doc_id, w FROM ex) GROUP BY w),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, w AS term, tf_cnt, df_cnt,
      |       round((CAST(tf_cnt AS DOUBLE) / CAST(doc_len AS DOUBLE))
      |             * ln(CAST(n_docs AS DOUBLE) / CAST(df_cnt AS DOUBLE)), 4) AS tfidf
      |FROM tf JOIN df USING (w) CROSS JOIN n
      |WHERE doc_id < 50
      |ORDER BY doc_id, term""".stripMargin

  /** Incremental ingestion dedup: an incoming batch is admitted only
    * where its content fingerprint is NOT already in the corpus — the
    * anti-join shape every continuously-fed training corpus needs
    * (full-corpus re-dedup per batch is a non-starter at 100 TB). The
    * corpus side reduces to DISTINCT fingerprints of one narrow column
    * before the shuffle; the anti-join is a plain fp equi-join.
    * Planted: clones of corpus docs (must be rejected) alongside the
    * genuinely-new slice (must be kept). */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val batch = d.filter(col("doc_id") % 7 === 0)
      .unionByName(corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val corpusFp = corpus.select(TF.fingerprint(col("text")).as("fp")).distinct()
    batch.withColumn("fp", TF.fingerprint(col("text")))
      .join(corpusFp, Seq("fp"), "left_anti")
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  val dedupIncrementalSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |corpus AS (SELECT * FROM d WHERE doc_id % 7 != 0),
      |batch AS (
      |  SELECT doc_id, text FROM d WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM corpus WHERE doc_id % 10 = 0)
      |SELECT b.doc_id FROM batch b
      |WHERE md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(b.text), '[ \t\n\r\f]+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'),
      |                              ' +', ' ', 'g')))
      |      NOT IN (SELECT md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'),
      |                                             ' +', ' ', 'g')))
      |              FROM corpus)
      |ORDER BY doc_id""".stripMargin

  /** BM25 term scoring (Robertson/Spärck Jones; k1=1.2, b=0.75, the
    * Lucene-style idf = ln(1 + (N-df+0.5)/(df+0.5))) of every document
    * against a fixed query-term set — the retrieval-scoring sibling of
    * [[tfidf]]. Scale shape: the corpus is exploded once and cut to the
    * query terms BEFORE the (doc, term) aggregation, so the shuffle
    * carries only query-term hits; df/N/avgdl sides are term-count- and
    * 1-row-sized (broadcast). avgdl is exact cross-engine: doc lengths
    * are integers, so their double sum is exact (≪ 2⁵³) and the mean is
    * one deterministic division. */
  val Bm25Terms = Seq("the", "data", "model", "with", "for")

  def bm25(s: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2; val b = 0.75
    // Two corpus scans by design: stats (N, avgdl) and hits are
    // separate consumers of the words projection, so the regexp runs
    // twice per document. Collapsing to one scan requires persisting
    // the exploded word stream — more memory than recompute is worth
    // at any scale (the projection is the scan's cheapest part after
    // pushdown). Same trade tfidf makes for its N subquery.
    val d = docs(s, dir).withColumn("__w", TF.words(col("text")))
    val stats = d.agg(count(lit(1)).cast("double").as("__n"),
      avg(size(col("__w")).cast("double")).as("__avgdl"))
    val hits = d.select(col("doc_id"), size(col("__w")).cast("double").as("__dl"),
        explode(col("__w")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
    val tf = hits.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first("__dl").as("__dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "term").crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(
          log(lit(1.0) + (col("__n") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))),
          4).as("bm25"))
      .orderBy("doc_id", "term")
  }

  val bm25Sql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(CAST(len(w) AS DOUBLE)) AS avgdl FROM d),
       |ex AS (
       |  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, unnest(w) AS term FROM d),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
       |  FROM ex WHERE term IN ($terms) GROUP BY doc_id, term),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
       |SELECT doc_id, term, tf, df,
       |       round(ln(1.0 + (n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |             * (CAST(tf AS DOUBLE) * 2.2)
       |             / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)),
       |             4) AS bm25
       |FROM tf JOIN dft USING (term) CROSS JOIN stats
       |ORDER BY doc_id, term""".stripMargin
  }

  /** Global line-level dedup over synthetic multi-line pages (5 docs
    * per page + 2 planted boilerplate lines every page — the cross-page
    * repeats the pass exists to strip): page 0 keeps its boilerplate,
    * every later page loses it, and any organically repeated document
    * line survives only at its first (page, idx) occurrence. */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val lined = docs(s, dir).select(
      (col("doc_id") / 5).cast("long").as("page_id"), col("doc_id"),
      col("text").as("line"))
    val pages = lined.groupBy("page_id").agg(
      concat(
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("line")))),
            x => x.getField("line")), "\n"),
        lit("\nShare this page with your friends.\nCopyright 2024 Example Corp. All rights reserved."))
        .as("page"))
    Dedup.lineDedupGlobal(pages, "page_id", "page").orderBy("page_id")
  }

  val lineDedupSql: String =
    """WITH lined AS (
      |  SELECT doc_id // 5 AS page_id, doc_id, text AS line FROM documents),
      |pages AS (
      |  SELECT page_id,
      |         string_agg(line, chr(10) ORDER BY doc_id)
      |           || chr(10) || 'Share this page with your friends.'
      |           || chr(10) || 'Copyright 2024 Example Corp. All rights reserved.' AS page
      |  FROM lined GROUP BY page_id),
      |ex AS (
      |  SELECT page_id, i AS idx, ls[i] AS line
      |  FROM (SELECT page_id, string_split(page, chr(10)) AS ls FROM pages),
      |       UNNEST(range(1, len(ls) + 1)) AS t(i)),
      |win AS (
      |  SELECT page_id, idx, line FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY line ORDER BY page_id, idx) AS rn
      |    FROM ex WHERE NOT regexp_matches(line, '^[ \t\r]*$')) WHERE rn = 1
      |  UNION ALL
      |  SELECT page_id, idx, line FROM ex WHERE regexp_matches(line, '^[ \t\r]*$')),
      |re AS (
      |  SELECT page_id, CAST(count(*) AS BIGINT) AS n_kept,
      |         string_agg(line, chr(10) ORDER BY idx) AS cleaned
      |  FROM win GROUP BY page_id)
      |SELECT p.page_id,
      |       coalesce(CAST(len(string_split(p.page, chr(10))) AS BIGINT), 0) AS n_lines,
      |       coalesce(re.n_kept, 0) AS n_kept,
      |       coalesce(re.cleaned, '') AS cleaned
      |FROM pages p LEFT JOIN re ON p.page_id = re.page_id
      |ORDER BY p.page_id""".stripMargin

  /** Gopher repetition rule: fraction of a document's word characters
    * contained in occurrences of its most frequent 2-gram (Rae et al.
    * 2021's "top n-gram character fraction" — high values flag
    * machine-generated / boilerplate text). Frequency needs the
    * MULTISET grams ([[TF.wordNgramsAllFromWords]]); argmax tie-break
    * is (max count, min gram), stated identically in the oracle. Scale
    * shape: explode → two map-side-combinable hash aggregations
    * ((doc, gram) count, then per-doc min_by argmax) — never a window. */
  def gopherRep(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("__w", TF.words(col("text")))
      .filter(size(col("__w")) >= 2)
      .withColumn("__base", length(array_join(col("__w"), " ")).cast("double"))
    val grams = d.select(col("doc_id"), col("__base"),
      explode(TF.wordNgramsAllFromWords(col("__w"), 2)).as("gram"))
    grams.groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("cnt"), first("__base").as("base"))
      .groupBy("doc_id")
      .agg(min_by(struct(col("gram"), col("cnt"), col("base")),
        struct((-col("cnt")).as("nc"), col("gram"))).as("t"))
      .select(col("doc_id"), col("t.gram").as("top_gram"), col("t.cnt").as("top_cnt"),
        round(col("t.cnt").cast("double") * length(col("t.gram")).cast("double") /
          col("t.base"), 6).as("top_gram_char_frac"))
      .orderBy("doc_id")
  }

  val gopherRepSql: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |f AS (
      |  SELECT doc_id, w, CAST(length(array_to_string(w, ' ')) AS DOUBLE) AS base
      |  FROM d WHERE len(w) >= 2),
      |g AS (
      |  SELECT doc_id, base,
      |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
      |  FROM f),
      |c AS (
      |  SELECT doc_id, gram, count(*) AS cnt, any_value(base) AS base
      |  FROM g GROUP BY doc_id, gram),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |                               ORDER BY cnt DESC, gram ASC) AS rn FROM c)
      |SELECT doc_id, gram AS top_gram, cnt AS top_cnt,
      |       round(CAST(cnt AS DOUBLE) * CAST(length(gram) AS DOUBLE) / base, 6)
      |         AS top_gram_char_frac
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Per-domain quota: at most 20 documents per source (the per-domain
    * cap step of web-corpus curation — one domain must not dominate the
    * mixture), via the bounded native [[graft.functions.BoundedMinK]]
    * aggregate — ≤ k values per (key, map task) on the shuffle, where
    * the row_number window would ship a hot domain's entire row set to
    * one reducer. */
  def domainCap(s: SparkSession, dir: String): DataFrame =
    graft.functions.Quota.topKPerKey(
        docs(s, dir).select(col("source"), col("doc_id")), "source", "doc_id", 20)
      .orderBy("source", "doc_id")

  val domainCapSql: String =
    """SELECT source, doc_id FROM (
      |  SELECT source, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20 ORDER BY source, doc_id""".stripMargin

  /** SemDeDup-style semantic dedup, composed end-to-end: embedding
    * near-dup PAIRS (hyperplane-LSH, cos ≥ 0.999 ⇔ identical vectors on
    * this corpus) → connected COMPONENTS (pairs under-connect; the
    * closure recovers full clusters) → keep the min-id REPRESENTATIVE
    * per cluster. Planted clusters: every 10th vector cloned at +1e6,
    * every 20th additionally at +2e6 (3-cliques). The oracle states the
    * fixpoint directly: one survivor per identical-embedding group. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("embedding"))
    val uni = e
      .unionByName(e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      .unionByName(e.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")))
    val pairs = Similarity.embeddingNearDupPairs(uni, "vec_id", "embedding",
      dim = 64, threshold = 0.999)
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
    val losers = comp.filter(col("id") =!= col("component"))
      .select(col("id").as("vec_id"))
    uni.select(col("vec_id")).join(losers, Seq("vec_id"), "left_anti")
      .orderBy("vec_id")
  }

  val semanticDedupSql: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |uni AS (
      |  SELECT vec_id, embedding FROM e
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding FROM e WHERE vec_id % 10 = 0
      |  UNION ALL
      |  SELECT vec_id + 2000000, embedding FROM e WHERE vec_id % 20 = 0)
      |SELECT min(vec_id) AS vec_id FROM uni GROUP BY embedding ORDER BY vec_id""".stripMargin

  /** Domain blocklist filtering (the C4 bad-URL step): parse each
    * document's source URL's registrable domain (deterministic planted
    * URL so both engines see one), drop blocklisted domains, report the
    * rest. Pure narrow projection + literal IN filter — no join, no
    * shuffle; a 10⁶-domain blocklist would become a broadcast semi-join
    * of the same shape. */
  val BlockedDomains = Seq("spam.example.com", "malware.test", "ads.invalid")

  def urlFilter(s: SparkSession, dir: String): DataFrame = {
    // planted URL: every 3rd doc gets a blocklisted host, the rest a
    // per-doc host — the filter must drop exactly the planted third
    val host = when(col("doc_id") % 3 === 0, lit(BlockedDomains.head))
      .otherwise(concat(lit("site"), pmod(col("doc_id"), lit(50L)), lit(".example.org")))
    val url = concat(lit("https://"), host, lit("/page/"), col("doc_id"))
    docs(s, dir).select(col("doc_id"), url.as("url"))
      .withColumn("domain", regexp_extract(col("url"), "^https?://([^/]+)/", 1))
      .filter(!col("domain").isin(BlockedDomains: _*))
      .select(col("doc_id"), col("domain"))
      .orderBy("doc_id")
  }

  val urlFilterSql: String = {
    val blocked = BlockedDomains.map(d => s"'$d'").mkString(", ")
    s"""SELECT doc_id, domain FROM (
       |  SELECT doc_id,
       |         regexp_extract(
       |           'https://' ||
       |           CASE WHEN doc_id % 3 = 0 THEN '${BlockedDomains.head}'
       |                ELSE 'site' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' END
       |           || '/page/' || CAST(doc_id AS VARCHAR),
       |           '^https?://([^/]+)/', 1) AS domain
       |  FROM documents)
       |WHERE domain NOT IN ($blocked)
       |ORDER BY doc_id""".stripMargin
  }

  /** Unigram-LM document scoring — the perplexity-proxy quality signal
    * (a KenLM stand-in computable without a model): corpus unigram
    * probabilities p(w) = cnt(w)/total, per-doc mean log-prob
    * Σ tf·ln(p(w)) / len(doc). Low scores flag gibberish/rare-token
    * text. Scale shape: one exploded-word aggregation for the LM (the
    * vocabulary-sized count table joins back on the word, AQE
    * broadcasts it when small), one per-doc aggregation for the score.
    * DETERMINISM: the per-doc float sum folds over the terms SORTED by
    * word (array_sort + fold, not a shuffle-order SUM), so both
    * engines add in the same order — same discipline as charEntropy. */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    // explode ONCE: the LM counts derive from the tf aggregate (its
    // (doc, w, tf) rows partition the word stream) and the total from
    // the LM — same discipline as tfidf's df derivation (review r4)
    val ex = docs(s, dir)
      .select(col("doc_id"), explode(TF.words(col("text"))).as("w"))
    val tf = ex.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val lm = tf.groupBy("w").agg(sum("tf").as("cnt"))
    val total = lm.agg(sum("cnt").cast("double").as("__total"))
    tf.join(lm, "w").crossJoin(broadcast(total))
      .withColumn("__contrib",
        col("tf").cast("double") * log(col("cnt").cast("double") / col("__total")))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_words"),
        array_sort(collect_list(struct(col("w"), col("__contrib")))).as("__terms"))
      .select(col("doc_id"), col("n_words"),
        round(
          aggregate(col("__terms"), lit(0.0), (acc, t) => acc + t.getField("__contrib")) /
            col("n_words").cast("double"),
          4).as("mean_logprob"))
      .orderBy("doc_id")
  }

  val unigramLogprobSql: String =
    """WITH ex AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM ex GROUP BY doc_id, w),
      |lm AS (SELECT w, count(*) AS cnt FROM ex GROUP BY w),
      |total AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM ex),
      |terms AS (
      |  SELECT doc_id, tf.w,
      |         CAST(tf AS DOUBLE) * ln(CAST(cnt AS DOUBLE) / t) AS contrib, tf
      |  FROM tf JOIN lm ON tf.w = lm.w CROSS JOIN total),
      |agg AS (
      |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
      |         list_aggregate(
      |           list_transform(
      |             list_sort(list({'w': w, 'c': contrib})), x -> x.c),
      |           'sum') AS lp
      |  FROM terms GROUP BY doc_id)
      |SELECT doc_id, n_words, round(lp / CAST(n_words AS DOUBLE), 4) AS mean_logprob
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Bigram LM perplexity proxy with add-k smoothing (k = 0.5) — the
    * KenLM-shaped fluency filter one notch above [[unigramLogprob]]:
    * per-doc mean of ln((c(w1,w2)+0.5)/(c(w1·)+0.5·V)) over the
    * corpus-trained bigram counts. c(w1·) derives from the bigram
    * aggregate itself (one gram explode feeds everything — the tfidf/
    * unigram single-scan discipline) and V from the distinct-unigram
    * count. Same determinism contract as unigram: per-(doc, bigram)
    * contributions fold in array_sort order, mean rounds to 4. Docs
    * under two words have no bigram and drop from the output. */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val bgs = docs(s, dir)
      .select(col("doc_id"),
        explode(TF.wordNgramsAllFromWords(TF.words(col("text")), 2)).as("bg"))
    val tf2 = bgs.groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
    val c2 = tf2.groupBy("bg").agg(sum("tf").as("c2"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = docs(s, dir)
      .select(explode(TF.words(col("text"))).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("__v"))
    tf2.join(c2, "bg").join(c1, "w1").crossJoin(broadcast(vocab))
      .withColumn("__contrib",
        col("tf").cast("double") *
          log((col("c2").cast("double") + 0.5) /
            (col("c1").cast("double") + lit(0.5) * col("__v"))))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        array_sort(collect_list(struct(col("bg"), col("__contrib")))).as("__terms"))
      .select(col("doc_id"), col("n_bigrams"),
        round(
          aggregate(col("__terms"), lit(0.0), (acc, t) => acc + t.getField("__contrib")) /
            col("n_bigrams").cast("double"),
          4).as("mean_logprob"))
      .orderBy("doc_id")
  }

  val bigramLogprobSql: String =
    """WITH w AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |bg AS (
      |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bg
      |  FROM w, UNNEST(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)),
      |tf2 AS (SELECT doc_id, bg, count(*) AS tf FROM bg GROUP BY doc_id, bg),
      |c2 AS (SELECT bg, split_part(bg, ' ', 1) AS w1, sum(tf) AS c2
      |       FROM tf2 GROUP BY bg),
      |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
      |v AS (SELECT CAST(count(DISTINCT u.w) AS DOUBLE) AS v
      |      FROM (SELECT unnest(w) AS w FROM w) u),
      |terms AS (
      |  SELECT tf2.doc_id, tf2.bg, tf2.tf,
      |         CAST(tf2.tf AS DOUBLE) *
      |           ln((CAST(c2.c2 AS DOUBLE) + 0.5)
      |              / (CAST(c1.c1 AS DOUBLE) + 0.5 * v.v)) AS contrib
      |  FROM tf2 JOIN c2 USING (bg) JOIN c1 ON c1.w1 = c2.w1 CROSS JOIN v),
      |agg AS (
      |  SELECT doc_id, sum(tf) AS n_bigrams,
      |         list_aggregate(
      |           list_transform(
      |             list_sort(list({'w': bg, 'c': contrib})), x -> x.c),
      |           'sum') AS lp
      |  FROM terms GROUP BY doc_id)
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |       round(lp / CAST(n_bigrams AS DOUBLE), 4) AS mean_logprob
      |FROM agg ORDER BY doc_id""".stripMargin

  /** PMI collocation mining — the corpus's top multi-word expressions
    * ("new york"-style units) by pointwise mutual information over
    * adjacent-token bigrams: pmi = ln(p(ab) / (p(a)·p(b))) with p(ab) =
    * c_ab/N_bigrams and p(a) = c_a/N_tokens, thresholded at
    * [[PmiMinCount]] occurrences (rare-pair PMI explodes — the standard
    * Church & Hanks 1990 guard). Feeds tokenizer vocab construction
    * (merge collocations before BPE) and phrase-aware dedup shingling.
    *
    * Shape: one gram explode → gram-grain hash aggregations (map-side
    * combinable), two broadcast one-row totals, a token-grain join for
    * the unigram counts, and a TakeOrdered top-k — nothing row-grain
    * ever sorts globally. Determinism: every count is exact BIGINT;
    * the pmi double derives from one fixed expression over those
    * counts, and ties at the top-k boundary break on (w1, w2). */
  private val PmiMinCount = 5
  private val PmiTopK = 30

  def collocationPmi(s: SparkSession, dir: String): DataFrame =
    collocationPmiFrom(
      docs(s, dir).select(col("doc_id"), TF.words(col("text")).as("__ws")),
      PmiMinCount, PmiTopK)

  /** Core of [[collocationPmi]] over a prepared (id, __ws) words
    * DataFrame — split out so unit tests can plant collocations. */
  def collocationPmiFrom(words: DataFrame, minCount: Int, topK: Int): DataFrame = {
    val uni = words.select(explode(col("__ws")).as("w"))
    val c1 = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val totU = uni.agg(count(lit(1)).cast("double").as("__nu"))
    val bg = words.select(
      explode(TF.wordNgramsAllFromWords(col("__ws"), 2)).as("bg"))
    val cab = bg.groupBy("bg").agg(count(lit(1)).as("n_ab"))
    val totB = bg.agg(count(lit(1)).cast("double").as("__nb"))
    cab
      .filter(col("n_ab") >= minCount)
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
      .join(c1.select(col("w").as("w1"), col("c").as("__ca")), "w1")
      .join(c1.select(col("w").as("w2"), col("c").as("__cb")), "w2")
      .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
      .select(col("w1"), col("w2"), col("n_ab"),
        round(
          log((col("n_ab").cast("double") * col("__nu") * col("__nu")) /
            (col("__nb") * col("__ca").cast("double") * col("__cb").cast("double"))),
          6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  val collocationPmiSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
       |uni AS (SELECT unnest(w) AS t FROM w),
       |c1 AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
       |tu AS (SELECT CAST(count(*) AS DOUBLE) AS nu FROM uni),
       |bg AS (
       |  SELECT array_to_string(w[i:i+1], ' ') AS bg
       |  FROM w, UNNEST(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)),
       |cab AS (SELECT bg, count(*) AS n_ab FROM bg GROUP BY bg),
       |j AS (
       |  SELECT split_part(cab.bg, ' ', 1) AS w1, split_part(cab.bg, ' ', 2) AS w2,
       |         cab.n_ab,
       |         round(ln((CAST(cab.n_ab AS DOUBLE) * tu.nu * tu.nu)
       |                  / (tb.nb * CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))), 6) AS pmi
       |  FROM cab
       |  JOIN c1 a ON a.t = split_part(cab.bg, ' ', 1)
       |  JOIN c1 b ON b.t = split_part(cab.bg, ' ', 2)
       |  CROSS JOIN tu
       |  CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS nb FROM bg) tb
       |  WHERE cab.n_ab >= $PmiMinCount)
       |SELECT w1, w2, n_ab, pmi FROM j
       |ORDER BY pmi DESC, w1, w2 LIMIT $PmiTopK""".stripMargin

  /** Quality-aware dedup representative: exact dedup on the content
    * fingerprint, but the survivor is the HIGHEST-quality duplicate
    * (ties → min doc_id), not the min id — real pipelines keep the
    * best-formatted copy of a cloned page, not an arbitrary one. Same
    * map-side-combinable min_by shape as exact dedup ([[Dedup
    * .exactDedup]] with a (−quality, id) preference key). Clones are
    * planted as NORMALIZED copies (lowercased, punctuation stripped —
    * fingerprint-identical by construction, but scoring differently on
    * the punct/stopword factors), so the quality preference is
    * observable: per pair, the higher-scoring copy must win, and both
    * engines compute which one that is from the same arithmetic. */
  def dedupQuality(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val uni = d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        TF.normalized(col("text")).as("text")))
    val base = uni
      .withColumn("quality", TF.qualityScore(col("text")))
      .withColumn("fp", TF.fingerprint(col("text")))
    Dedup.exactDedup(base, col("fp"), struct((-col("quality")).as("nq"), col("doc_id")))
      .select(col("doc_id"), col("fp"), round(col("quality"), 4).as("quality"))
      .orderBy("doc_id")
  }

  val dedupQualitySql: String =
    """WITH uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |         trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'),
      |                             ' +', ' ', 'g'))
      |  FROM documents WHERE doc_id % 10 = 0),
      |q AS (
      |  SELECT doc_id,
      |         least(n_tok / 100.0, 1.0)
      |           * (1.0 - least(punct / greatest(CAST(n_tok AS DOUBLE), 1.0), 1.0))
      |           * (0.5 + least(stop / greatest(CAST(n_tok AS DOUBLE), 1.0) * 2.0, 0.5))
      |           AS quality,
      |         md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'),
      |                                 ' +', ' ', 'g'))) AS fp
      |  FROM (SELECT doc_id, text,
      |               len(regexp_extract_all(text, '\S+')) AS n_tok,
      |               len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS punct,
      |               len(regexp_extract_all(lower(text),
      |                   '\b(the|and|of|to|a|in|is|it|for|on)\b')) AS stop
      |        FROM uni))
      |SELECT doc_id, fp, round(quality, 4) AS quality FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
      |                               ORDER BY quality DESC, doc_id ASC) AS rn
      |  FROM q)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** End-to-end fuzzy dedup — the full RefinedWeb-style pass in ONE
    * composed plan: MinHash-LSH near-dup pairs (threshold 0.999 ⇔
    * identical shingle sets, the construction [[dedupMinhash]]'s oracle
    * already pins) → connected components (pairs → clusters) → keep the
    * highest-quality member per cluster (ties → min doc_id); docs with
    * no near-dup are their own cluster. The oracle restates the
    * fixpoint: group by the canonical shingle-set signature, survivors
    * = per-group quality argmax — independent of LSH, banding, and the
    * component algorithm. */
  def fuzzyDedupE2e(s: SparkSession, dir: String): DataFrame = {
    val uni = docsWithClones(s, dir)
    val pairs = Dedup.minhashNearDupPairs(uni, "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, threshold = 0.999)
      .select(col("id_a"), col("id_b"))
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
    val members = uni.withColumn("quality", TF.qualityScore(col("text")))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
    members.groupBy("cluster")
      .agg(min_by(struct(col("doc_id"), col("quality")),
        struct((-col("quality")).as("nq"), col("doc_id"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"),
        round(col("__w.quality"), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** DuckDB replay: identical-shingle-set groups among shingleable docs
    * (≥ 3 words — the same `ok` guard the LSH side applies); docs below
    * the shingle size are singletons and always survive. */
  val fuzzyDedupE2eSql: String =
    """WITH uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |), g AS (
      |  SELECT doc_id, text,
      |         CASE WHEN len(w) >= 3
      |              THEN md5(array_to_string(list_sort(list_distinct(
      |                     list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))), chr(10)))
      |              ELSE 'solo-' || CAST(doc_id AS VARCHAR) END AS grp
      |  FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      |        FROM uni)
      |), q AS (
      |  SELECT doc_id, grp,
      |         least(n_tok / 100.0, 1.0)
      |           * (1.0 - least(punct / greatest(CAST(n_tok AS DOUBLE), 1.0), 1.0))
      |           * (0.5 + least(stop / greatest(CAST(n_tok AS DOUBLE), 1.0) * 2.0, 0.5))
      |           AS quality
      |  FROM (SELECT doc_id, grp,
      |               len(regexp_extract_all(text, '\S+')) AS n_tok,
      |               len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS punct,
      |               len(regexp_extract_all(lower(text),
      |                   '\b(the|and|of|to|a|in|is|it|for|on)\b')) AS stop
      |        FROM g))
      |SELECT doc_id, round(quality, 4) AS quality FROM (
      |  SELECT doc_id, quality,
      |         ROW_NUMBER() OVER (PARTITION BY grp
      |                            ORDER BY quality DESC, doc_id ASC) AS rn
      |  FROM q)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Percentile-bounded length filter — the outlier-trimming step of
    * corpus curation (drop truncated fragments below p5 and runaway
    * concatenations above p99). The exact percentile pair is ONE tiny
    * scalar aggregate broadcast against the narrow length projection;
    * at 100 TB swap in approx_percentile exactly as corpusStats
    * documents. */
  def lengthFilter(s: SparkSession, dir: String): DataFrame = {
    val lens = docs(s, dir)
      .select(col("doc_id"), TF.tokenCount(col("text")).cast("double").as("n"))
    val bounds = lens.agg(
      expr("percentile(n, 0.05)").as("__lo"), expr("percentile(n, 0.99)").as("__hi"))
    lens.crossJoin(broadcast(bounds))
      .filter(col("n") >= col("__lo") && col("n") <= col("__hi"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  val lengthFilterSql: String =
    """WITH lens AS (
      |  SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n
      |  FROM documents),
      |b AS (SELECT quantile_cont(n, 0.05) AS lo, quantile_cont(n, 0.99) AS hi FROM lens)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens
      |FROM lens CROSS JOIN b
      |WHERE n >= lo AND n <= hi
      |ORDER BY doc_id""".stripMargin

  /** Shard manifest — the per-output-file summary a packed training
    * export ships with (doc count, token total, id range per shard).
    * Derives from [[shardPack]]'s assignment; one map-side-combinable
    * aggregation over the packed rows. */
  def packManifest(s: SparkSession, dir: String): DataFrame =
    graft.functions.Packing.packShards(
        docs(s, dir).select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 2000L)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard_id")

  val packManifestSql: String =
    """WITH p AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0)
      |              AS BIGINT) AS shard_id
      |  FROM (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
      |        FROM documents))
      |SELECT shard_id, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM p GROUP BY shard_id ORDER BY shard_id""".stripMargin

  /** Video/audio frame sampling plumbing under the value oracle: 4
    * evenly spaced 16-byte frames per payload (UTF-8 bytes of the text
    * standing in for a media blob). Byte-level determinism: the frame
    * offsets are double arithmetic truncated to int, and the oracle
    * replays the identical expression over the identical bytes —
    * hex(frame) pins the exact slice, not just its length. Narrow
    * generate + projection; no shuffle. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        posexplode(Multimodal.sampleFrames(col("payload"), n = 4, frameBytes = 16)))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        octet_length(col("col")).cast("long").as("frame_len"),
        hex(col("col")).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  /** DuckDB 1.0 has no BLOB substring — the byte slice is taken on the
    * hex encoding instead (2 hex chars per byte, same bytes). */
  val frameSampleSql: String =
    """WITH p AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS len
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, i AS frame_idx,
      |         substring(h,
      |           (CAST(trunc(i * greatest((len - 16) / 3.0, 0) + 1) AS INT) - 1) * 2 + 1,
      |           32) AS fh
      |  FROM p, UNNEST(range(0, 4)) AS t(i))
      |SELECT doc_id, frame_idx, CAST(length(fh) // 2 AS BIGINT) AS frame_len,
      |       fh AS frame_hex
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Winnowing document fingerprints (MOSS rolling-hash scheme): word
    * 3-gram hashes, window-4 minima, distinct sorted set — any shared
    * run of ≥ 6 words between two documents shares a fingerprint.
    * Output pins the whole set (count, first/last, md5 of the joined
    * array) without emitting an array column. */
  def winnowFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("__w", TF.words(col("text")))
      .withColumn("fp", TF.winnowFingerprints(col("__w"), k = 3, window = 4))
      .filter(size(col("fp")) > 0)
      .select(col("doc_id"), size(col("fp")).cast("long").as("n_fp"),
        element_at(col("fp"), 1).as("first_fp"),
        element_at(col("fp"), -1).as("last_fp"),
        md5(concat_ws(",", col("fp")).cast("binary")).as("fp_hash"))
      .orderBy("doc_id")

  val winnowFingerprintSql: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         list_transform(range(1, greatest(len(w) - 2, 0) + 1),
      |           i -> substring(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8)) AS ghs
      |  FROM d),
      |f AS (
      |  SELECT doc_id,
      |         list_sort(list_distinct(list_transform(range(1, len(ghs) - 2),
      |           i -> list_min(ghs[i:i+3])))) AS fp
      |  FROM g WHERE len(ghs) >= 4)
      |SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
      |       fp[1] AS first_fp, fp[-1] AS last_fp,
      |       md5(array_to_string(fp, ',')) AS fp_hash
      |FROM f WHERE len(fp) >= 1 ORDER BY doc_id""".stripMargin

  /** Resize plumbing under the value oracle: stub-decoded dimensions →
    * aspect-preserving fit into 224×224 (never upscaling) → output
    * geometry + byte estimate, identical double arithmetic replayed by
    * the oracle. */
  def resizeMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("img", Multimodal.stubDecodeImage(col("payload")))
      .select(col("doc_id"), Multimodal.stubResize(col("img"), 224, 224).as("rz"))
      .select(col("doc_id"), col("rz.width").as("out_w"),
        col("rz.height").as("out_h"), col("rz.size_bytes").as("out_bytes"))
      .orderBy("doc_id")

  val resizeMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      |d AS (
      |  SELECT doc_id, CAST(n % 640 + 16 AS DOUBLE) AS w,
      |         CAST((n * 7) % 480 + 16 AS DOUBLE) AS h
      |  FROM m),
      |sc AS (
      |  SELECT doc_id, w, h, least(224.0 / w, 224.0 / h, 1.0) AS s FROM d)
      |SELECT doc_id,
      |       greatest(CAST(floor(w * s) AS BIGINT), 1) AS out_w,
      |       greatest(CAST(floor(h * s) AS BIGINT), 1) AS out_h,
      |       greatest(CAST(floor(w * s) AS BIGINT), 1)
      |         * greatest(CAST(floor(h * s) AS BIGINT), 1) * 3 AS out_bytes
      |FROM sc ORDER BY doc_id""".stripMargin

  /** Temperature-flattened domain sampling (the multilingual-BERT /
    * data-mixture α=0.5 scheme): per-domain keep probability
    * p_d = min(1, sqrt(n_min / n_d)) — small domains survive whole,
    * large domains are downsampled toward the smallest, flattening the
    * mixture exactly like count^α reweighting with the smallest domain
    * as the anchor. Every arithmetic step (integer counts, one division,
    * one sqrt — both correctly rounded IEEE) is bit-reproducible across
    * engines, so the md5-threshold inclusion decision (the
    * [[Dedup.mixtureSample]] mechanism) is value-oracled, not just
    * rate-checked. Domains are derived skewed (floor(sqrt(src_idx))
    * over 20 uniform sources) so the flattening is observable.
    *
    * 100 TB: two scans of the narrow (doc_id, source) projection — one
    * map-side-combined count, one filter against a broadcast rate table
    * (#domains rows). No shuffle of the corpus. */
  def temperatureSample(s: SparkSession, dir: String): DataFrame = {
    val dom = floor(sqrt(regexp_extract(col("source"), "([0-9]+)$", 1)
      .cast("double"))).cast("long")
    val d = docs(s, dir).select(col("doc_id"), col("source"), dom.as("dom"))
    val counts = d.groupBy("dom").agg(count(lit(1)).as("n_d"))
    val nMin = counts.agg(min(col("n_d")).as("__n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col("dom"),
        least(lit(1.0), sqrt(col("__n_min").cast("double") / col("n_d").cast("double")))
          .as("__p"))
    Dedup.mixtureSample(d.join(broadcast(rates), "dom"),
        col("doc_id"), col("__p"), salt = "temp")
      .select(col("doc_id"), col("source"), col("dom"), round(col("__p"), 6).as("rate"))
      .orderBy("doc_id")
  }

  val temperatureSampleSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(floor(sqrt(CAST(regexp_extract(source, '([0-9]+)$', 1) AS DOUBLE)))
      |              AS BIGINT) AS dom
      |  FROM documents),
      |c AS (SELECT dom, count(*) AS n_d FROM d GROUP BY dom),
      |m AS (SELECT min(n_d) AS n_min FROM c),
      |r AS (SELECT dom, least(1.0, sqrt(CAST(n_min AS DOUBLE) / CAST(n_d AS DOUBLE))) AS p
      |      FROM c, m)
      |SELECT doc_id, source, dom, round(p, 6) AS rate
      |FROM d JOIN r USING (dom)
      |WHERE p >= 1.0
      |   OR substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 8)
      |      < printf('%08x', CAST(floor(p * 4294967296.0) AS BIGINT))
      |ORDER BY doc_id""".stripMargin

  /** BM25 retrieval: top-10 documents per query for a 3-query workload,
    * scored by summed per-term BM25 ([[bm25]]'s arithmetic) and cut with
    * the bounded-heap top-k aggregate ([[graft.functions.Quota
    * .topKPerKey]]) — ≤ k rows per (query, map task) cross the shuffle,
    * never a query's full posting list. Per-doc score folds over
    * term-sorted contributions so the float sum is order-deterministic;
    * ranking ties break on doc_id in both engines. */
  /** BM25 (qid, doc_id, score-rounded-4) for [[RetrievalQueries]] —
    * the shared scoring core of [[bm25TopK]] and [[hybridSearch]]. */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2; val b = 0.75
    import s.implicits._
    val qterms = RetrievalQueries.flatMap { case (qid, ts) => ts.map((qid, _)) }
      .toDF("qid", "term")
    val d = docs(s, dir).withColumn("__w", TF.words(col("text")))
    val stats = d.agg(count(lit(1)).cast("double").as("__n"),
      avg(size(col("__w")).cast("double")).as("__avgdl"))
    val hits = d.select(col("doc_id"), size(col("__w")).cast("double").as("__dl"),
        explode(col("__w")).as("term"))
      .filter(col("term").isin(RetrievalQueries.flatMap(_._2).distinct: _*))
    val tf = hits.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first("__dl").as("__dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "term").crossJoin(broadcast(stats))
      .withColumn("__s",
        log(lit(1.0) + (col("__n") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .join(broadcast(qterms), "term")
      .groupBy("qid", "doc_id")
      .agg(array_sort(collect_list(struct(col("term"), col("__s")))).as("__ts"))
      .select(col("qid"), col("doc_id"),
        round(aggregate(col("__ts"), lit(0.0), (acc, t) => acc + t.getField("__s")), 4)
          .as("score"))
  }

  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    graft.functions.Quota.topKPerKey(
        bm25Scored(s, dir)
          .withColumn("__ord", struct((-col("score")).as("ns"), col("doc_id").as("id"))),
        "qid", "__ord", 10)
      .select(col("qid"), col("doc_id"), col("score"))
      .orderBy("qid", "doc_id")

  private val RetrievalQueries: Seq[(Long, Seq[String])] = Seq(
    (0L, Seq("data", "model")),
    (1L, Seq("the", "with")),
    (2L, Seq("model", "for", "data")))

  val bm25TopKSql: String = {
    val qrows = RetrievalQueries.flatMap { case (q, ts) =>
      ts.map(t => s"($q, '$t')")
    }.mkString(", ")
    s"""WITH q(qid, term) AS (VALUES $qrows),
       |d AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(CAST(len(w) AS DOUBLE)) AS avgdl
       |  FROM d),
       |hits AS (
       |  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, unnest(w) AS term
       |  FROM d),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf, first(dl) AS dl
       |  FROM hits WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY doc_id, term),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT qid, doc_id,
       |         round(list_aggregate(
       |           list_transform(list_sort(list({'t': tf.term, 's':
       |             ln(1.0 + (n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |             (CAST(tf AS DOUBLE) * 2.2) /
       |             (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))})),
       |             x -> x.s), 'sum'), 4) AS score
       |  FROM tf JOIN dft USING (term) CROSS JOIN stats JOIN q ON q.term = tf.term
       |  GROUP BY qid, doc_id)
       |SELECT qid, doc_id, score FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |                               ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM scored)
       |WHERE rn <= 10 ORDER BY qid, doc_id""".stripMargin
  }

  /** Hybrid retrieval with reciprocal-rank fusion (the canonical RAG
    * retrieval stack): a SPARSE leg (BM25 top-10, [[bm25Scored]]) and
    * a DENSE leg (cosine top-10 over model-free hashing-trick
    * embeddings — integer dot products, so the scores are bit-exact
    * cross-engine) fused per query as Σ 1/(60 + rank) over the legs a
    * doc appears in (Cormack et al. 2009) — rank fusion needs no score
    * calibration between legs, which is why RRF is the default in
    * production hybrid search. All fusion arithmetic is on small
    * integer ranks → deterministic. Per-leg cuts ride the bounded-heap
    * top-k; the rank windows touch ≤ k rows per query. */
  def hybridSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{Quota, VectorSketch}
    import org.apache.spark.sql.expressions.Window
    val K = 10; val Dim = 64; val C = 60

    val sparseRank = Quota.topKPerKey(
        bm25Scored(s, dir)
          .withColumn("__ord", struct((-col("score")).as("ns"), col("doc_id").as("id"))),
        "qid", "__ord", K)
      .withColumn("sparse_rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("score"), col("doc_id"))))
      .select("qid", "doc_id", "sparse_rank")

    val qdf = RetrievalQueries.toDF("qid", "terms")
      .withColumn("__qv", VectorSketch.hashingVector(col("terms"), Dim))
      .withColumn("__qq", aggregate(transform(col("__qv"), x => x * x), lit(0L), _ + _))
      .filter(col("__qq") > 0)
    val dv = docs(s, dir)
      .withColumn("__dv", VectorSketch.hashingVector(TF.words(col("text")), Dim))
      .withColumn("__dd", aggregate(transform(col("__dv"), x => x * x), lit(0L), _ + _))
      .filter(col("__dd") > 0)
      .select("doc_id", "__dv", "__dd")
    val dense = dv.crossJoin(broadcast(qdf))
      .withColumn("__dot",
        aggregate(zip_with(col("__qv"), col("__dv"), _ * _), lit(0L), _ + _))
      .withColumn("cos", round(col("__dot").cast("double") /
        (sqrt(col("__qq").cast("double")) * sqrt(col("__dd").cast("double"))), 6))
      .select("qid", "doc_id", "cos")
    val denseRank = Quota.topKPerKey(
        dense.withColumn("__ord", struct((-col("cos")).as("nc"), col("doc_id").as("id"))),
        "qid", "__ord", K)
      .withColumn("dense_rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("doc_id"))))
      .select("qid", "doc_id", "dense_rank")

    val fused = sparseRank.join(denseRank, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(C) + col("sparse_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(C) + col("dense_rank")), lit(0.0)), 6))
    Quota.topKPerKey(
        fused.withColumn("__ord", struct((-col("rrf")).as("nr"), col("doc_id").as("id"))),
        "qid", "__ord", 5)
      .select(col("qid"), col("doc_id"), col("sparse_rank"), col("dense_rank"), col("rrf"))
      .orderBy("qid", "doc_id")
  }

  val hybridSearchSql: String = {
    val qrows = RetrievalQueries.flatMap { case (q, ts) =>
      ts.map(t => s"($q, '$t')")
    }.mkString(", ")
    s"""WITH q(qid, term) AS (VALUES $qrows),
       |d AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(CAST(len(w) AS DOUBLE)) AS avgdl
       |  FROM d),
       |hits AS (
       |  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, unnest(w) AS term
       |  FROM d),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf, first(dl) AS dl
       |  FROM hits WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY doc_id, term),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT qid, doc_id,
       |         round(list_aggregate(
       |           list_transform(list_sort(list({'t': tf.term, 's':
       |             ln(1.0 + (n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |             (CAST(tf AS DOUBLE) * 2.2) /
       |             (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))})),
       |             x -> x.s), 'sum'), 4) AS score
       |  FROM tf JOIN dft USING (term) CROSS JOIN stats JOIN q ON q.term = tf.term
       |  GROUP BY qid, doc_id),
       |sr AS (
       |  SELECT qid, doc_id, rn AS sparse_rank FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |                                 ORDER BY score DESC, doc_id ASC) AS rn
       |    FROM scored)
       |  WHERE rn <= 10),
       |qv AS (
       |  SELECT qid, ('0x' || substr(md5(term), 1, 4))::BIGINT % 64 AS bucket,
       |         SUM(CASE WHEN ('0x' || substr(md5(term), 5, 1))::BIGINT % 2 = 0
       |                  THEN 1 ELSE -1 END) AS v
       |  FROM q GROUP BY 1, 2),
       |dtok AS (SELECT doc_id, unnest(w) AS w FROM d),
       |dvec AS (
       |  SELECT doc_id, ('0x' || substr(md5(w), 1, 4))::BIGINT % 64 AS bucket,
       |         SUM(CASE WHEN ('0x' || substr(md5(w), 5, 1))::BIGINT % 2 = 0
       |                  THEN 1 ELSE -1 END) AS v
       |  FROM dtok GROUP BY 1, 2),
       |qn AS (SELECT qid, SUM(v * v) AS qq FROM qv GROUP BY qid HAVING SUM(v * v) > 0),
       |dn AS (SELECT doc_id, SUM(v * v) AS dd FROM dvec GROUP BY doc_id HAVING SUM(v * v) > 0),
       |dotj AS (
       |  SELECT qv.qid, dvec.doc_id, SUM(qv.v * dvec.v) AS dot
       |  FROM qv JOIN dvec USING (bucket) GROUP BY 1, 2),
       |cosd AS (
       |  SELECT qn.qid, dn.doc_id,
       |         round(CAST(coalesce(dotj.dot, 0) AS DOUBLE)
       |               / (sqrt(CAST(qn.qq AS DOUBLE)) * sqrt(CAST(dn.dd AS DOUBLE))), 6) AS cos
       |  FROM qn CROSS JOIN dn
       |  LEFT JOIN dotj ON dotj.qid = qn.qid AND dotj.doc_id = dn.doc_id),
       |dr AS (
       |  SELECT qid, doc_id, rn AS dense_rank FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |                                 ORDER BY cos DESC, doc_id ASC) AS rn
       |    FROM cosd)
       |  WHERE rn <= 10),
       |fused AS (
       |  SELECT coalesce(sr.qid, dr.qid) AS qid,
       |         coalesce(sr.doc_id, dr.doc_id) AS doc_id,
       |         sr.sparse_rank, dr.dense_rank,
       |         round(coalesce(1.0 / (60 + sr.sparse_rank), 0)
       |               + coalesce(1.0 / (60 + dr.dense_rank), 0), 6) AS rrf
       |  FROM sr FULL OUTER JOIN dr
       |    ON sr.qid = dr.qid AND sr.doc_id = dr.doc_id)
       |SELECT qid, doc_id, sparse_rank, dense_rank, rrf FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |                               ORDER BY rrf DESC, doc_id ASC) AS rn
       |  FROM fused)
       |WHERE rn <= 5 ORDER BY qid, doc_id""".stripMargin
  }

  /** DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * words hash into 256 buckets (first 2 md5 hex chars — the bucket
    * key stays a string, no cross-engine hex parsing), a target
    * distribution is estimated from the quality slice (docs with ≥ 40
    * words), a raw distribution from the whole corpus, and each doc
    * scores Σ_b c_doc[b]·(ln p̂_target[b] − ln p̂_raw[b]) with add-1
    * smoothing — the log importance weight used to resample raw data
    * toward the target domain.
    *
    * 100 TB: one explode + two map-side-combined aggregations over
    * (doc, bucket); the λ table is ≤ 256 rows and broadcast; the
    * per-doc fold sorts ≤ 256 entries. No corpus reshuffle beyond the
    * (doc_id, bucket) count. */
  def dsirWeight(s: SparkSession, dir: String): DataFrame = {
    val B = 256
    val ex = docs(s, dir)
      .select(col("doc_id"), explode(TF.words(col("text"))).as("w"))
      .select(col("doc_id"), substring(md5(col("w").cast("binary")), 1, 2).as("b"))
    val db = ex.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val dl = db.groupBy("doc_id").agg(sum("c").as("n_words"))
    val tgtIds = dl.filter(col("n_words") >= 40).select("doc_id")
    val rawCnt = db.groupBy("b").agg(sum("c").as("cr"))
    val tgtCnt = db.join(tgtIds, Seq("doc_id"), "left_semi")
      .groupBy("b").agg(sum("c").as("ct"))
    val totals = rawCnt.agg(sum("cr").cast("double").as("__tr"))
      .crossJoin(tgtCnt.agg(sum("ct").cast("double").as("__tt")))
    val lambda = rawCnt.join(tgtCnt, Seq("b"), "left_outer")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct").cast("double") + lit(1.0)) / (col("__tt") + lit(B.toDouble))) -
         log((col("cr").cast("double") + lit(1.0)) / (col("__tr") + lit(B.toDouble))))
          .as("__lam"))
    db.join(broadcast(lambda), "b")
      .withColumn("__contrib", col("c").cast("double") * col("__lam"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"),
        array_sort(collect_list(struct(col("b"), col("__contrib")))).as("__bs"))
      .select(col("doc_id"), col("n_words"),
        round(aggregate(col("__bs"), lit(0.0), (acc, t) => acc + t.getField("__contrib")),
          4).as("log_weight"))
      .orderBy("doc_id")
  }

  val dsirWeightSql: String =
    """WITH ex AS (
      |  SELECT doc_id,
      |         substr(md5(unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))), 1, 2) AS b
      |  FROM documents),
      |db AS (SELECT doc_id, b, count(*) AS c FROM ex GROUP BY doc_id, b),
      |dl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words FROM db GROUP BY doc_id),
      |tgt AS (SELECT doc_id FROM dl WHERE n_words >= 40),
      |rawc AS (SELECT b, sum(c) AS cr FROM db GROUP BY b),
      |tgtc AS (SELECT b, sum(c) AS ct FROM db WHERE doc_id IN (SELECT doc_id FROM tgt)
      |         GROUP BY b),
      |tot AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM rawc) AS tr,
      |               (SELECT CAST(sum(ct) AS DOUBLE) FROM tgtc) AS tt),
      |lam AS (
      |  SELECT rawc.b,
      |         ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) / (tt + 256.0)) -
      |         ln((CAST(cr AS DOUBLE) + 1.0) / (tr + 256.0)) AS lam
      |  FROM rawc LEFT JOIN tgtc ON rawc.b = tgtc.b CROSS JOIN tot)
      |SELECT doc_id, n_words,
      |       round(list_aggregate(
      |         list_transform(list_sort(list({'b': db.b, 'c':
      |           CAST(c AS DOUBLE) * lam})), x -> x.c), 'sum'), 4) AS log_weight
      |FROM db JOIN lam ON db.b = lam.b JOIN dl USING (doc_id)
      |GROUP BY doc_id, n_words ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_collocation_pmi" -> (collocationPmi _),
    "q_ann_recall" -> (annRecall _),
    "q_temperature_sample" -> (temperatureSample _),
    "q_bm25_topk" -> (bm25TopK _),
    "q_hybrid_search" -> (hybridSearch _),
    "q_dsir_weight" -> (dsirWeight _),
    "q_winnow_fingerprint" -> (winnowFingerprint _),
    "q_resize_meta" -> (resizeMeta _),
    "q_frame_sample" -> (frameSample _),
    "q_length_filter" -> (lengthFilter _),
    "q_pack_manifest" -> (packManifest _),
    "q_fuzzy_dedup_e2e" -> (fuzzyDedupE2e _),
    "q_dedup_quality" -> (dedupQuality _),
    "q_url_filter" -> (urlFilter _),
    "q_unigram_logprob" -> (unigramLogprob _),
    "q_bigram_logprob" -> (bigramLogprob _),
    "q_bm25" -> (bm25 _),
    "q_line_dedup" -> (lineDedup _),
    "q_gopher_rep" -> (gopherRep _),
    "q_domain_cap" -> (domainCap _),
    "q_semantic_dedup" -> (semanticDedup _),
    "q_dedup_incremental" -> (dedupIncremental _),
    "q_tfidf" -> (tfidf _),
    "q_corpus_stats" -> (corpusStats _),
    "q_oov_rate" -> (oovRate _),
    "q_quality_gopher" -> (qualityGopher _),
    "q_c4_clean" -> (c4Clean _),
    "q_mixture_sample" -> (mixtureSampleQ _),
    "q_components" -> (componentsQ _),
    "q_shard_pack" -> (shardPack _),
    "q_curriculum" -> (curriculumRank _),
    "q_export_jsonl" -> (exportJsonl _),
    "q_tfrecord_roundtrip" -> (tfrecordRoundtrip _),
    "q_webdataset_roundtrip" -> (webdatasetRoundtrip _),
    "q_image_decode" -> (imageDecode _),
    "q_audio_decode" -> (audioDecode _),
    "q_image_resize" -> (imageResize _),
    "q_context_windows" -> (contextWindowsQ _),
    "q_dedup_incremental_fuzzy" -> (dedupIncrementalFuzzy _),
    "q_dedup_index_persisted" -> (dedupIndexPersisted _),
    "q_vocab_topk" -> (vocabTopK _),
    "q_countmin_hh" -> (countMinHH _),
    "q_text_stats" -> (textStats _),
    "q_sentence_split" -> (sentenceSplit _),
    "q_lang_id" -> (langIdQ _),
    "q_pii_scrub" -> (piiScrub _),
    "q_url_extract" -> (urlExtract _),
    "q_chunking" -> (chunking _),
    "q_repetition" -> (repetitionQ _),
    "q_char_entropy" -> (charEntropyQ _),
    "q_embedding_quantize" -> (embeddingQuantize _),
    "q_contamination" -> (contamination _),
    "q_pipeline_e2e" -> (pipelineE2e _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_typo" -> (dedupTypo _),
    "q_ngram_jaccard_chain" -> (ngramJaccardChain _),
    "q_dedup_minhash" -> (dedupMinhash _),
    "q_dedup_containment" -> (dedupContainment _),
    "q_containment_sweep" -> (containmentSweep _),
    "q_dedup_simhash" -> (dedupSimhash _),
    "q_dedup_simhash_exact" -> (dedupSimhashExact _),
    "q_embedding_neardup" -> (embeddingNearDup _),
    "q_ann_brute_force" -> (annBruteForce _),
    "q_ann_range" -> (annRange _),
    "q_ann_filtered" -> (annFiltered _),
    "q_ann_ivf" -> (annIvf _),
    "q_ann_ivf_persisted" -> (annIvfPersisted _),
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_image_phash" -> (imagePhash _),
    "q_phash_neardup" -> (phashNearDup _))

  // a def, not a val: dedupSimhashSql resolves its stage path at dump
  // time (set by the query run in this JVM), so the map must be rebuilt
  // per access rather than freezing the class-init default
  def oracles: Map[String, String] = Map(
    "q_collocation_pmi" -> collocationPmiSql,
    "q_ann_recall" -> annRecallSql,
    "q_temperature_sample" -> temperatureSampleSql,
    "q_bm25_topk" -> bm25TopKSql,
    "q_hybrid_search" -> hybridSearchSql,
    "q_dsir_weight" -> dsirWeightSql,
    "q_winnow_fingerprint" -> winnowFingerprintSql,
    "q_resize_meta" -> resizeMetaSql,
    "q_frame_sample" -> frameSampleSql,
    "q_length_filter" -> lengthFilterSql,
    "q_pack_manifest" -> packManifestSql,
    "q_fuzzy_dedup_e2e" -> fuzzyDedupE2eSql,
    "q_dedup_quality" -> dedupQualitySql,
    "q_url_filter" -> urlFilterSql,
    "q_unigram_logprob" -> unigramLogprobSql,
    "q_bigram_logprob" -> bigramLogprobSql,
    "q_bm25" -> bm25Sql,
    "q_line_dedup" -> lineDedupSql,
    "q_gopher_rep" -> gopherRepSql,
    "q_domain_cap" -> domainCapSql,
    "q_semantic_dedup" -> semanticDedupSql,
    "q_dedup_incremental" -> dedupIncrementalSql,
    "q_tfidf" -> tfidfSql,
    "q_corpus_stats" -> corpusStatsSql,
    "q_oov_rate" -> oovRateSql,
    "q_quality_gopher" -> qualityGopherSql,
    "q_c4_clean" -> c4CleanSql,
    "q_mixture_sample" -> mixtureSampleSql,
    "q_components" -> componentsSql,
    "q_shard_pack" -> shardPackSql,
    "q_curriculum" -> curriculumRankSql,
    "q_export_jsonl" -> exportJsonlSql,
    "q_tfrecord_roundtrip" -> tfrecordRoundtripSql,
    "q_webdataset_roundtrip" -> webdatasetRoundtripSql,
    "q_image_decode" -> imageDecodeSql,
    "q_audio_decode" -> audioDecodeSql,
    "q_image_resize" -> imageResizeSql,
    "q_context_windows" -> contextWindowsSql,
    "q_dedup_incremental_fuzzy" -> dedupIncrementalFuzzySql,
    "q_dedup_index_persisted" -> dedupIndexPersistedSql,
    "q_vocab_topk" -> vocabTopKSql,
    "q_countmin_hh" -> countMinHHSql,
    "q_text_stats" -> textStatsSql,
    "q_sentence_split" -> sentenceSplitSql,
    "q_lang_id" -> langIdSql,
    "q_pii_scrub" -> piiScrubSql,
    "q_url_extract" -> urlExtractSql,
    "q_chunking" -> chunkingSql,
    "q_repetition" -> repetitionSql,
    "q_char_entropy" -> charEntropySql,
    "q_embedding_quantize" -> embeddingQuantizeSql,
    "q_contamination" -> contaminationSql,
    "q_pipeline_e2e" -> pipelineE2eSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_typo" -> dedupTypoSql,
    "q_ngram_jaccard_chain" -> ngramJaccardChainSql,
    "q_dedup_minhash" -> dedupMinhashSql,
    "q_dedup_containment" -> dedupContainmentSql,
    "q_containment_sweep" -> containmentSweepSql,
    "q_dedup_simhash" -> dedupSimhashSql,
    "q_dedup_simhash_exact" -> dedupSimhashExactSql,
    "q_embedding_neardup" -> embeddingNearDupSql,
    "q_ann_brute_force" -> annBruteForceSql,
    "q_ann_range" -> annRangeSql,
    "q_ann_filtered" -> annFilteredSql,
    "q_ann_ivf" -> annIvfSql,
    "q_ann_ivf_persisted" -> annIvfSql,
    "q_multimodal_meta" -> multimodalMetaSql,
    "q_image_phash" -> imagePhashSql,
    "q_phash_neardup" -> phashNearDupSql)
}
