package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, SimHash.
  *
  * All pure `Column` compositions over built-in (codegen'd) functions —
  * no UDFs — so every operator stays inside whole-stage codegen and
  * scales linearly with a parquet scan: at 100 TB these run as a single
  * narrow projection, no shuffle.
  */
object TextFunctions {

  /** Whitespace-delimited tokens. */
  def tokens(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))

  /** Alphanumeric words of the lowercased text (unit for n-grams,
    * language ID, stopword ratio) — native byte scan, byte-exact with
    * `regexp_extract_all(lower(c), "[a-z0-9]+")` (property-pinned). */
  def words(c: Column): Column = TextScanExpr.wordsExtract(c)

  // The COUNT faces ride native single-pass byte scans
  // ([[TextScanExpr]]) instead of size(regexp_extract_all(...)):
  // byte-exact same semantics (property-pinned), no match-array
  // allocation, no regex NFA — the per-row cost that dominates a
  // 100 TB corpus scan. `tokens`/`words` stay regex: they return the
  // match arrays themselves.
  def tokenCount(c: Column): Column = TextScanExpr.tokenCount(c)

  /** BPE-ish token estimate: runs of letters, single digits, or single
    * punctuation — approximates subword tokenizer output without a
    * vocabulary. */
  def bpeTokenEstimate(c: Column): Column =
    TextScanExpr.bpeEstimateCount(lower(c))

  val StopwordsEn = Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

  def stopwordCount(c: Column): Column =
    TextScanExpr.wordSetCount(lower(c), StopwordsEn)

  def punctCount(c: Column): Column = TextScanExpr.punctCount(c)

  /** Heuristic document quality in [0,1]: length saturation × low-punct
    * × stopword-informed naturalness (shape follows the usual
    * length/punct/stopword-ratio heuristics for web-corpus filtering). */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val punctRatio = punctCount(c).cast("double") / greatest(nTok, lit(1.0))
    val stopRatio = stopwordCount(c).cast("double") / greatest(nTok, lit(1.0))
    least(nTok / lit(100.0), lit(1.0)) *
      (lit(1.0) - least(punctRatio, lit(1.0))) *
      (lit(0.5) + least(stopRatio * lit(2.0), lit(0.5)))
  }

  /** Language marker words (tiny n-gram/stopword heuristic — enough to
    * separate major European languages on natural text). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "des", "en", "un", "une", "est", "que"),
    "es" -> Seq("el", "los", "las", "de", "y", "por", "una", "es", "del", "como"))

  def langScore(c: Column, markers: Seq[String]): Column =
    TextScanExpr.wordSetCount(lower(c), markers)

  /** Argmax language with a fixed priority order on ties (en>de>fr>es).
    * NULL text yields NULL, not a label: null scores make every
    * comparison null, so a when-chain would otherwise fall through to
    * the final otherwise branch and confidently classify a null
    * document as the LAST language in the marker list (review r6).
    *
    * The argmax folds over ONE array of (score, lang) structs, so each
    * marker counter runs exactly once per row — the when-chain form
    * re-referenced the scores up to ~9 times, and the counters are
    * CodegenFallback expressions (no subexpression elimination in the
    * interpreted path), so every reference re-lowercased and re-scanned
    * the whole document (review r12). Strict `>` keeps the EARLIER
    * language on ties — the same priority order; the -1 seed loses to
    * every real (non-negative) count. */
  def langId(c: Column): Column = {
    val arr = array(LangMarkers.map { case (lang, ms) =>
      struct(langScore(c, ms).as("s"), lit(lang).as("l"))
    }: _*)
    val best = aggregate(arr, struct(lit(-1).as("s"), lit("").as("l")),
      (acc, x) => when(x("s") > acc("s"), x).otherwise(acc))
    when(c.isNull, lit(null).cast("string")).otherwise(best("l"))
  }

  /** Canonical text normalization: lowercase, collapse ALL whitespace
    * runs to one space, strip non-alphanumerics, collapse again, trim.
    * The whitespace pass must come FIRST and be an explicit class
    * ([ \t\n\r\f] — `\s` differs between regex dialects): the
    * alnum-strip alone would DELETE newlines/tabs, gluing 'foo\nbar'
    * into 'foobar' while 'foo bar' stayed two words — so two documents
    * differing only in line-wrapping got different fingerprints and
    * 'foo\nbar' falsely collided with the distinct 'foobar'
    * (review r6). */
  def normalized(c: Column): Column =
    trim(regexp_replace(regexp_replace(
      regexp_replace(lower(c), "[ \t\n\r\f]+", " "), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint: md5 of the normalized text — the exact-dedup
    * key (whitespace/punctuation/case-insensitive). */
  def fingerprint(c: Column): Column = md5(normalized(c).cast("binary"))

  /** Fixed-size word-window chunks with overlap (stride = chunkWords −
    * overlap) from a *pre-bound words column* — the LLM-training
    * document splitter. Chunk i covers words [i·stride+1, i·stride+
    * chunkWords]; the last chunk may be shorter; a doc shorter than one
    * window yields one chunk. Same performance contract as
    * wordNgramsFromWords: bind `w` with .withColumn first. */
  def wordChunks(w: Column, chunkWords: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkWords,
      s"overlap $overlap must be in [0, chunkWords=$chunkWords)")
    val stride = chunkWords - overlap
    val nChunks = greatest(
      ceil((size(w) - lit(overlap)).cast("double") / lit(stride)).cast("int"), lit(1))
    transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(w, i * stride + 1, lit(chunkWords))))
  }

  /** Repetition ratio in [0,1): 1 − |distinct words| / |words| — the
    * boilerplate/spam signal used by web-corpus quality filters. A
    * document with NO words scores 0.0, not 1.0: the old
    * greatest(n,1) guard made empty docs 1 − 0/1 = maximally
    * repetitive, the strongest possible spam signal for text with no
    * repetition at all (review r6). */
  def repetitionRatio(w: Column): Column =
    when(size(w) > 0,
      lit(1.0) - size(array_distinct(w)).cast("double") / size(w).cast("double"))
      .otherwise(lit(0.0))

  /** Character array of the lowercased text (bind with .withColumn
    * before charEntropyFromChars — same contract as
    * wordNgramsFromWords). */
  def charsOf(c: Column): Column = filter(split(lower(c), ""), ch => ch =!= "")

  /** Character entropy (bits/char) from a *pre-bound* chars column —
    * the gibberish / encoded-blob detector (natural prose ~4 bits,
    * base64 blobs ~6, repeated boilerplate ~1). Distinct characters are
    * SORTED before the entropy fold so the floating-point summation
    * order is deterministic and identical to the (also sorted) oracle. */
  def charEntropyFromChars(chars: Column): Column = {
    val n = size(chars).cast("double")
    val uniq = array_sort(array_distinct(chars))
    val ent = aggregate(uniq, lit(0.0), (acc, ch) => {
      val p = size(filter(chars, x => x === ch)).cast("double") / n
      acc - p * log2(p)
    })
    when(n > 0, ent).otherwise(lit(0.0))
  }

  /** Convenience single-expression form — fine for tests/small frames;
    * hot paths must bind charsOf first (HOF lambdas get no CSE, so the
    * split here re-evaluates per distinct character). */
  def charEntropy(c: Column): Column = charEntropyFromChars(charsOf(c))

  /** URLs in the text (http/https). */
  def urls(c: Column): Column =
    regexp_extract_all(c, lit("https?://[^\\s]+"), lit(0))

  /** PII scrubbing for training corpora: IPv4 addresses, emails, and
    * phone-like digit runs replaced with placeholder tokens. Patterns
    * are RE2-compatible (no lookaround/backrefs) so the same expressions
    * run identically on Spark (java.util.regex) and the DuckDB oracle
    * (RE2). Order matters — most-specific first: EMAILS first, with a
    * dotted-quad alternation in the domain (IP-first turned
    * 'john.doe@192.168.1.1' into 'john.doe@<IP>', leaving the
    * IDENTIFYING local part unscrubbed forever — the alpha-TLD email
    * pattern can never match '<IP>'; review r12), then bare IPs (the
    * loose phone pattern would otherwise eat a dotted quad), then
    * phones. */
  def scrubPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\\.[A-Za-z]{2,}|([0-9]{1,3}\\.){3}[0-9]{1,3})",
      "<EMAIL>")
    val ip = regexp_replace(email, "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>")
    regexp_replace(ip, "\\+?[0-9][0-9()\\-. ]{7,}[0-9]", "<PHONE>")
  }

  /** Word n-grams (shingles) from a words column, distinct (first-
    * occurrence order, `array_distinct` semantics). Empty array when
    * the document has fewer than n words. Native one-pass expression
    * ([[WordNgramsExpr]]) — byte-exact with the historical
    * `transform(sequence(...), i -> concat_ws(" ", element_at...))` +
    * `array_distinct` HOF chain (property-pinned) without its
    * interpreted per-element lambdas; the old bind-`w`-first
    * performance contract is obsolete (the expression reads its input
    * array once), though binding first still helps any OTHER
    * HOF consumers sharing the column. */
  def wordNgramsFromWords(w: Column, n: Int): Column =
    TextScanExpr.wordNgrams(w, n, distinct = true)

  /** Word n-grams WITH multiplicity (no distinct) — the unit for
    * frequency-weighted signals like the Gopher top-n-gram character
    * fraction, where how OFTEN a gram repeats is the signal
    * [[wordNgramsFromWords]]'s set semantics would erase. */
  def wordNgramsAllFromWords(w: Column, n: Int): Column =
    TextScanExpr.wordNgrams(w, n, distinct = false)

  /** 64-bit SimHash over whitespace tokens (xxhash64 token hashes; bit
    * j set iff the +1/-1 vote sum over tokens is positive). Token
    * hashing stays a declarative HOF; the 64-bit vote fold is the
    * native SimHash64 expression (a 64-wide zip_with fold costs O(64)
    * plan nodes and interpreted per-token lambdas — see MinHashExpr). */
  def simhash64(c: Column): Column =
    MinHashExpr.simhash64(transform(tokens(c), t => xxhash64(t)))

  /** Hamming distance between two 64-bit hashes (near-dup distance for
    * SimHash). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Corpus vocabulary: the k most-document-frequent word n-grams
    * (each doc counts a gram once — [[wordNgramsFromWords]] is
    * per-doc-distinct), ties broken by gram text so the cut is total.
    * Scale shape: explode -> hash-partial count (map-side combined on
    * the gram) -> TakeOrdered top-k — the global "sort" ships only k
    * rows per partition to the driver-side merge, never the
    * vocabulary. */
  def topKNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.withColumn("__w", words(col(textCol)))
      .select(explode(wordNgramsFromWords(col("__w"), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
      .orderBy(desc("doc_freq"), asc("ngram"))
      .limit(k)

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    * the MOSS rolling-hash fingerprint scheme): hash every word
    * k-gram, slide a window of `window` consecutive gram hashes, keep
    * each window's MINIMUM — guaranteeing any shared substring of ≥
    * k+window−1 words between two documents shares a fingerprint.
    * Gram hashes are the first 8 hex chars of md5 (fixed width, so
    * lexicographic min == numeric min) — cross-engine replayable, the
    * same trick [[Dedup.mixtureSample]] uses. Returns the DISTINCT
    * sorted fingerprint array. Bind `w` first (performance contract of
    * [[wordNgramsFromWords]]); per-row cost O(grams × window)
    * interpreted — fine for document-sized rows; the native-expression
    * upgrade path (one rolling pass) mirrors MinHashExpr if profiling
    * ever demands it.
    *
    * The gram-hash array is BOUND as a lambda variable (1-element
    * transform) before the window slide: HOF lambdas get no CSE, so
    * referencing the md5-over-all-grams expression directly inside the
    * per-window lambda re-hashed every gram at every window position —
    * O(grams²) md5 work per row against the documented
    * O(grams × window) (review r6). */
  def winnowFingerprints(w: Column, k: Int, window: Int): Column = {
    require(window >= 1, s"window must be >= 1, got $window")
    val grams = wordNgramsAllFromWords(w, k)
    val ghsExpr = transform(grams, g => substring(md5(g.cast("binary")), 1, 8))
    element_at(transform(array(ghsExpr), ghs => {
      val nWin = size(ghs) - lit(window - 1)
      val mins = transform(sequence(lit(1), nWin),
        i => array_min(slice(ghs, i, lit(window))))
      array_sort(array_distinct(
        when(nWin < 1, array().cast("array<string>")).otherwise(mins)))
    }), 1)
  }

  /** Gopher-style document quality rules (Rae et al. 2021, the rule
    * subset expressible without a language model): word-count bounds,
    * mean-word-length bounds, symbol-to-word ratio, alphabetic-token
    * ratio, and distinct-stopword presence. Returns a struct of
    * per-rule booleans plus the conjunction `pass` — callers filter on
    * `pass` or inspect individual rules for corpus diagnostics. Pure
    * narrow projection, same scale shape as the other text ops. */
  def gopherFlags(c: Column): Column = {
    val toks = tokens(c)
    val w = words(c)
    val nTok = size(toks)
    val meanLen = when(size(w) > 0,
      aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(w).cast("double")).otherwise(lit(0.0))
    val symbols = size(regexp_extract_all(c, lit("[#…]"), lit(0)))
    val alphaToks = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val stopDistinct = size(array_distinct(
      regexp_extract_all(lower(c), lit("\\b(" + StopwordsEn.mkString("|") + ")\\b"), lit(0))))
    val okWords = nTok.between(50, 100000)
    val okMeanLen = meanLen.between(3.0, 10.0)
    val okSymbol = symbols.cast("double") <= nTok.cast("double") * lit(0.1)
    val okAlpha = when(nTok > 0,
      alphaToks.cast("double") / nTok.cast("double") >= lit(0.8)).otherwise(lit(false))
    val okStop = stopDistinct >= 2
    struct(
      okWords.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbol.as("ok_symbol_ratio"),
      okAlpha.as("ok_alpha_ratio"),
      okStop.as("ok_stopwords"),
      (okWords && okMeanLen && okSymbol && okAlpha && okStop).as("pass"))
  }

  /** Linear quality classifier over rational text features — the shape
    * of a fastText/logistic web-quality filter with the weights made
    * explicit and pluggable (swap in trained weights without touching
    * the plan). Features are all count ratios (no transcendentals), so
    * the score is exact deterministic double arithmetic and the DuckDB
    * oracle replays it bit-for-bit: length saturation min(ntok/100, 1),
    * punctuation ratio, stopword ratio, and repetition (1 − distinct
    * words / words). Score folds left-associative in feature order. */
  def linearQualityScore(
      c: Column,
      bias: Double, wLen: Double, wPunct: Double,
      wStop: Double, wRep: Double): Column = {
    val w = words(c)
    val nTok = tokenCount(c).cast("double")
    val denom = greatest(nTok, lit(1.0))
    val fLen = least(nTok / lit(100.0), lit(1.0))
    val fPunct = punctCount(c).cast("double") / denom
    val fStop = stopwordCount(c).cast("double") / denom
    // zero-word docs have ZERO repetition, not maximal: the old
    // 1 − 0/greatest(0,1) = 1.0 shape scored an empty doc as the most
    // repetitive text possible — the exact bug [[repetitionRatio]]'s
    // review-r6 fix removed, re-implemented here (review r12)
    val fRep = when(size(w) > 0,
      lit(1.0) - size(array_distinct(w)).cast("double") /
        size(w).cast("double")).otherwise(lit(0.0))
    lit(bias) + lit(wLen) * fLen + lit(wPunct) * fPunct +
      lit(wStop) * fStop + lit(wRep) * fRep
  }

  /** URL canonicalization (the normalization pass in front of URL-level
    * dedup / frequency counting in a crawl pipeline): drop the
    * fragment, lowercase the host, strip default ports (:80/:443),
    * strip tracking query parameters (utm_*, gclid, fbclid), and clean
    * the leftover '?'/'&' separators. Pure RE2-compatible regex
    * pipeline — identical patterns run on Spark (java.util.regex) and
    * the DuckDB oracle (RE2). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val rawHost = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    // strip only the scheme's OWN default port: http://h:443/x is a
    // real, distinct endpoint (443 is not http's default) — the old
    // unconditional ':(80|443)$' strip merged it with http://h/x
    // (review r6)
    val host = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val rest = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+(.*)$", 1)
    // Anchor on the preceding separator (kept via $1) so only whole
    // query parameters named utm_*/gclid/fbclid are stripped — without
    // it, 'gclid=' in a path segment or inside another parameter's NAME
    // ('?id_gclid=7') would be eaten (review r4). The separator of a
    // following stripped param is consumed by the previous match, so
    // runs of '&' can remain — collapsed before the existing cleanup.
    // utm names may carry digits and FURTHER underscores
    // (utm_source_platform, utm_creative_format — standard GA4 params);
    // 'utm_[a-zA-Z]+' stopped at the second '_' and left such params
    // as distinct dedup keys for identical pages (review r12)
    val noTrack = regexp_replace(rest,
      "([?&])(utm_[a-zA-Z0-9_]+|gclid|fbclid)=[^&#]*", "$1")
    val clean = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "&{2,}", "&"), "\\?&", "?"),
      "[?&]+$", "")
    // URLs that don't parse as scheme://host (scheme-relative '//cdn…',
    // bare 'example.com/x' — both common in crawl data) pass through
    // with only the fragment stripped: the old unconditional concat
    // collapsed ALL of them to the literal '://', merging every
    // unparseable URL into one dedup key (review r6)
    when(length(rawHost) === 0, trim(noFrag))
      .otherwise(concat(scheme, lit("://"), host, clean))
  }

  /** C4-style line cleaning (Raffel et al. 2020): keep only lines that
    * end in terminal punctuation (. ! ? ") and contain at least
    * `minWords` whitespace tokens; drop the rest and re-join. The
    * per-document form of the C4 cleanup pass — narrow, codegen'd,
    * no shuffle. */
  def cleanLines(c: Column, minWords: Int = 5): Column = {
    val lines = split(c, "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]\\s*$") &&
        size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= minWords)
    array_join(kept, "\n")
  }
}
