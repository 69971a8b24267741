package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the tokenizer
  * family next to BPE (`Bpe.trainMerges`) a training-data pipeline
  * needs: instead of greedy pair merges, a piece VOCABULARY with
  * probabilities is refined by EM, and words segment by minimum-cost
  * (Viterbi) paths under the current piece costs (Kudo 2018's unigram
  * LM, simplified to a fixed-round, prune-free EM so the whole train is
  * replayable as a deterministic oracle).
  *
  * Algorithm (all constants are part of the contract):
  *  1. word table: corpus words (`TextFunctions.words` grain), words
  *     longer than `maxWordLen` chars dropped (rare tail; bounds the
  *     DP), with corpus occurrence counts.
  *  2. seed vocabulary: every substring of length 1..`maxPieceLen`
  *     weighted by containing-word frequency; ALL single chars plus the
  *     top `seedMulti` multi-char pieces by (count desc, piece asc).
  *  3. `rounds` × EM: piece cost = floor(−ln(cnt/total)·1e6 + 0.5) as
  *     an INTEGER (quantized log-prob: the Viterbi DP then runs in
  *     exact BIGINT arithmetic, so min/tie decisions are bit-identical
  *     across engines — no FP comparison anywhere in the DP); E-step
  *     Viterbi-segments each WORD (never the corpus) with tie-break
  *     preferring the longest piece; M-step re-counts piece usages
  *     weighted by word frequency. Pieces with zero usage drop out
  *     (every word stays segmentable: the pieces of its previous
  *     segmentation survive by construction).
  *
  * Scale shape: the corpus is scanned ONCE (the word-frequency
  * aggregation, map-side combinable); everything after runs at
  * vocabulary grain (distinct words), where the DP is a per-row
  * O(maxWordLen·maxPieceLen) codegen'd higher-order-function fold —
  * no shuffle beyond one hash aggregation per round, no window, no
  * driver loop over data. Only the piece vocabulary (bounded ≤
  * singles + seedMulti) is collected per round to build the cost-map
  * literal — the same bounded-artifact collect as
  * `Bpe.trainMergesOnWords`' merge list.
  *
  * Reference scope note: gojek/feast has no tokenizer training; this
  * sits in the LLM-pipeline operator family next to the BPE trainer
  * (SURVEY §2 additions).
  */
object UnigramLm {

  /** Unreachable-path sentinel for the integer DP: far above any real
    * path cost (≤ maxWordLen · quant · ln(total) ≈ 2e8) and far below
    * Long overflow even after a few additive steps. Must match the
    * oracle's literal. */
  val Sentinel = 1000000000000000L // 10^15

  /** Cost quantization: −ln(p) · 1e6, floor(+0.5). */
  val Quant = 1e6

  /** (word, freq, len ≤ maxWordLen) from a text column — corpus scanned
    * once, map-side combinable. */
  def wordFreq(df: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    df.select(explode(TextFunctions.words(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed candidates: (piece, cnt) for every substring of length
    * 1..maxPieceLen, weighted by word freq (every occurrence position
    * counts). */
  def seedCandidates(wf: DataFrame, maxPieceLen: Int): DataFrame =
    wf.select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("i") + col("l") - 1 <= length(col("word")))
      .select(col("word").substr(col("i"), col("l")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Seed vocabulary: all single chars + top `seedMulti` multi-char
    * pieces by (cnt desc, piece asc) — deterministic total order. */
  def seedVocab(cand: DataFrame, seedMulti: Int): DataFrame =
    cand.filter(length(col("piece")) === 1).unionByName(
      cand.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece").asc).limit(seedMulti))

  /** Quantized integer piece costs from counts (driver side — the
    * vocabulary is bounded). `math.log` is `java.lang.Math.log`, the
    * same function Spark's `log` expression and (by the repo's 180
    * hash-matched ln-using oracles) DuckDB's `ln` realize. */
  def quantizedCosts(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val total = vocab.iterator.map(_._2).sum.toDouble
    vocab.iterator.map { case (p, c) =>
      p -> math.floor(-math.log(c.toDouble / total) * Quant + 0.5).toLong
    }.toMap
  }

  /** One E-step: Viterbi-segment every word under `costs` and return
    * the new (piece, cnt) usage counts, freq-weighted. */
  def viterbiCounts(wf: DataFrame, costs: Map[String, Long],
      maxPieceLen: Int, maxWordLen: Int): DataFrame =
    viterbiSegments(wf, costs, maxPieceLen, maxWordLen)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Viterbi segmentation of every word under `costs`: the input
    * columns plus a `pieces` array (the min-cost segmentation,
    * left-to-right).
    *
    * The DP and backtrace are pure codegen'd column expressions
    * (higher-order `aggregate` folds) — per word O(len·maxPieceLen),
    * no join, no shuffle. Tie-break: the LONGEST piece whose path cost
    * equals dp[pos] wins (checked longest-first — the identical CASE
    * order the oracle unrolls). */
  def viterbiSegments(wf: DataFrame, costs: Map[String, Long],
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val costMap = typedlit(costs)
    def costOf(piece: Column): Column = element_at(costMap, piece)
    val w = col("word")

    // dp[i] (index i+1 in the array) = min cost of segmenting the first
    // i chars; unreachable = Sentinel-valued, never chosen over a real
    // path and exactly reproduced by the oracle's COALESCE(_, BIG)
    val dpExpr = aggregate(
      sequence(lit(1), length(w)),
      array(lit(0L)),
      (acc: Column, i: Column) => {
        val terms = (1 to maxPieceLen).map { l =>
          when(i >= l,
            coalesce(
              element_at(acc, i - l + 1) + costOf(w.substr(i - l + 1, lit(l))),
              lit(Sentinel))
          ).otherwise(lit(Sentinel))
        }
        concat(acc, array(if (terms.size == 1) terms.head else least(terms: _*)))
      })

    // backtrace: fixed maxWordLen steps (each consumes ≥ 1 char), state
    // (pos, pieces); at each step choose the longest l with
    // dp[pos−l] + cost(piece) == dp[pos]
    val dp = col("__dp")
    val btExpr = aggregate(
      sequence(lit(1), lit(maxWordLen)),
      struct(length(w).as("pos"), typedlit(Seq.empty[String]).as("ps")),
      (s: Column, _: Column) => {
        val pos = s.getField("pos")
        def pieceAt(l: Int) = w.substr(pos - (l - 1), lit(l))
        def matches(l: Int) =
          pos >= l && coalesce(
            element_at(dp, pos - l + 1) + costOf(pieceAt(l)),
            lit(Sentinel)) === element_at(dp, pos + 1)
        var lStar: Column = lit(1)
        var piece: Column = pieceAt(1)
        for (l <- 2 to maxPieceLen) {
          lStar = when(matches(l), lit(l)).otherwise(lStar)
          piece = when(matches(l), pieceAt(l)).otherwise(piece)
        }
        when(pos <= 0, s).otherwise(
          struct((pos - lStar).as("pos"), concat(s.getField("ps"), array(piece)).as("ps")))
      })

    // the backtrace walks END → START, so the accumulated array is the
    // segmentation reversed — reverse once so the public contract
    // ("left-to-right") holds for callers using the pieces as an
    // actual tokenization (counts/sizes are order-blind) (review r13)
    wf.withColumn("__dp", dpExpr)
      .withColumn("pieces", reverse(btExpr.getField("ps")))
      .drop("__dp")
  }

  /** Likelihood-based vocabulary prune (the step real SentencePiece
    * runs each EM round — Kudo 2018 §3.2's "prune the bottom X% by
    * likelihood loss", here with the loss simplified to the piece's
    * total quantized-cost contribution cnt·cost so the whole prune is
    * exact BIGINT arithmetic and replays in the oracle): single-char
    * pieces always survive (every word stays segmentable by
    * construction), multi-char pieces keep the top
    * m − ⌊m·prunePct/100⌋ by (loss desc, piece asc) — the drop count
    * is INTEGER floor division so both engines compute the identical
    * boundary with no FP ceil at the edge. */
  def pruneVocab(rows: IndexedSeq[(String, Long)], prunePct: Int)
      : IndexedSeq[(String, Long)] = {
    require(prunePct >= 0 && prunePct < 100, s"prunePct must be in [0, 100), got $prunePct")
    if (prunePct == 0) return rows
    val costs = quantizedCosts(rows)
    val (singles, multi) = rows.partition(_._1.length == 1)
    val keep = multi.size - multi.size * prunePct / 100
    singles ++ multi
      .sortBy { case (p, c) => (-(c * costs(p)), p) }
      .take(keep)
  }

  /** The shared EM core: word table (checkpointed once) + `rounds`
    * E/M rounds (each optionally followed by the [[pruneVocab]] step);
    * returns (wf, final vocabulary counts as driver rows — the
    * vocabulary is bounded ≤ singles + seedMulti, the same bounded
    * artifact every round already collected). [[train]], [[model]] and
    * [[encodeWords]] all ride this — a second copy of the loop would
    * let the entry points' training contracts drift (review r13). */
  private def emRounds(df: DataFrame, textCol: String,
      maxPieceLen: Int, maxWordLen: Int,
      seedMulti: Int, rounds: Int,
      prunePct: Int): (DataFrame, IndexedSeq[(String, Long)]) = {
    require(rounds >= 1 && maxPieceLen >= 1 && maxWordLen >= maxPieceLen)
    // the word table feeds the seed AND every round's E-step — pin it
    // once (the bpeEncode checkpoint precedent, review r4)
    val wf = wordFreq(df, textCol, maxWordLen).localCheckpoint()
    var rows = seedVocab(seedCandidates(wf, maxPieceLen), seedMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    for (_ <- 1 to rounds) {
      rows = viterbiCounts(wf, quantizedCosts(rows), maxPieceLen, maxWordLen)
        .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      rows = pruneVocab(rows, prunePct)
    }
    (wf, rows)
  }

  /** Trained-model ENCODE, fused train+encode form: train `rounds` EM
    * rounds, then Viterbi-segment the WORD TABLE once more under the
    * final model's costs and return (word, n_pieces) — the per-word
    * token counts a caller joins back to the corpus for document-level
    * token/compression stats. Words beyond `maxWordLen` are outside
    * the training universe and absent here too (the caller's join
    * keeps the same universe).
    *
    * This RE-RUNS the EM train on every call (VERDICT r13 #1) — the
    * production lifecycle is [[model]] → persist the artifact →
    * [[encodeWordsWithModel]], which never re-pays training; this
    * fused form stays as the one-shot convenience and the oracle's
    * replay twin. */
  def encodeWords(df: DataFrame, textCol: String,
      maxPieceLen: Int = 3, maxWordLen: Int = 12,
      seedMulti: Int = 200, rounds: Int = 2): DataFrame = {
    val (wf, finalRows) =
      emRounds(df, textCol, maxPieceLen, maxWordLen, seedMulti, rounds, 0)
    viterbiSegments(wf, quantizedCosts(finalRows), maxPieceLen, maxWordLen)
      .select(col("word"), size(col("pieces")).cast("long").as("n_pieces"))
  }

  /** ENCODE FROM A TRAINED MODEL (the persisted-lifecycle encode —
    * the tokenizer family's `ivfPqSearchIndex`): Viterbi-segment the
    * word table of `df` under the artifact's (piece, cost) map, NO EM
    * — cost is O(batch words), so an incremental batch never re-pays
    * the corpus train. `costs` is [[model]]'s (piece → cost) read back
    * from the persisted artifact (bounded vocabulary — a driver map by
    * construction). `maxPieceLen`/`maxWordLen` must be the values the
    * model was trained with (they bound the DP the costs were fitted
    * under). Words containing characters outside the trained charset
    * have no finite-cost path: they still segment deterministically
    * (sentinel arithmetic, longest-first tie-break — spec-pinned), the
    * unigram analog of an <unk> token. */
  def encodeWordsWithModel(df: DataFrame, textCol: String,
      costs: Map[String, Long],
      maxPieceLen: Int = 3, maxWordLen: Int = 12): DataFrame = {
    require(costs.nonEmpty, "empty unigram model")
    viterbiSegments(wordFreq(df, textCol, maxWordLen), costs, maxPieceLen, maxWordLen)
      .select(col("word"), size(col("pieces")).cast("long").as("n_pieces"))
  }

  /** Driver-side (piece, cnt, cost) rows from final counts — the one
    * cost quantization, shared by [[train]] and [[model]] so the
    * persisted artifact's costs are bit-identical to the fused path's
    * ([[quantizedCosts]] and the oracle's ln both realize
    * java.lang.Math.log — the repo-wide ln discipline). */
  private def withCosts(rows: IndexedSeq[(String, Long)])
      : IndexedSeq[(String, Long, Long)] = {
    val costs = quantizedCosts(rows)
    rows.map { case (p, c) => (p, c, costs(p)) }
  }

  /** ONE train → sorted (piece, cnt, cost) rows — [[train]] and
    * [[model]] are views of this (a second copy of the tail was one
    * prune/cost edit away from breaking the "train is the top-K view
    * of model" contract — review r14). */
  private def trainedRows(df: DataFrame, textCol: String,
      maxPieceLen: Int, maxWordLen: Int,
      seedMulti: Int, rounds: Int, prunePct: Int)
      : IndexedSeq[(String, Long, Long)] = {
    val (wf, rows) =
      emRounds(df, textCol, maxPieceLen, maxWordLen, seedMulti, rounds, prunePct)
    Components.releaseCheckpoint(wf) // both callers return local frames — wf is done
    withCosts(rows).sortBy { case (p, c, _) => (-c, p) }
  }

  /** Full train: returns the final vocabulary as
    * (piece, cnt, cost BIGINT) — cost quantized from the final counts —
    * top `topK` by (cnt desc, piece asc). `prunePct` > 0 additionally
    * runs the [[pruneVocab]] likelihood prune after every EM round. */
  def train(df: DataFrame, textCol: String,
      maxPieceLen: Int = 3, maxWordLen: Int = 12,
      seedMulti: Int = 200, rounds: Int = 2, topK: Int = 100,
      prunePct: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainedRows(df, textCol, maxPieceLen, maxWordLen, seedMulti, rounds, prunePct)
      .take(topK).toDF("piece", "cnt", "cost")
  }

  /** The MODEL ARTIFACT: the complete final vocabulary (piece, cnt,
    * cost) — no topK cut, because the encode DP needs every trained
    * piece ([[train]] is the top-K inspection view). Persist this
    * (e.g. via [[graft.sources.VersionedTable]] or a staging dir) and
    * encode new batches with [[encodeWordsWithModel]] without ever
    * re-running EM. */
  def model(df: DataFrame, textCol: String,
      maxPieceLen: Int = 3, maxWordLen: Int = 12,
      seedMulti: Int = 200, rounds: Int = 2, prunePct: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainedRows(df, textCol, maxPieceLen, maxWordLen, seedMulti, rounds, prunePct)
      .toDF("piece", "cnt", "cost")
  }
}
