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

  /** The shared EM core: word table (checkpointed once) + `rounds`
    * E/M rounds; returns (wf, final vocabulary counts). Both [[train]]
    * and [[encodeWords]] ride this — a second copy of the loop would
    * let the two entry points' training contracts drift (review r13). */
  private def emRounds(df: DataFrame, textCol: String,
      maxPieceLen: Int, maxWordLen: Int,
      seedMulti: Int, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && maxPieceLen >= 1 && maxWordLen >= maxPieceLen)
    // the word table feeds the seed AND every round's E-step — pin it
    // once (the bpeEncode checkpoint precedent, review r4)
    val wf = wordFreq(df, textCol, maxWordLen).localCheckpoint()
    var vocab = seedVocab(seedCandidates(wf, maxPieceLen), seedMulti)
    for (_ <- 1 to rounds) {
      val rows = vocab.collect()
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      vocab = viterbiCounts(wf, quantizedCosts(rows), maxPieceLen, maxWordLen)
    }
    (wf, vocab)
  }

  /** Trained-model ENCODE (the [[graft.functions.Bpe]] `bpeEncode`
    * lifecycle for the unigram family): train `rounds` EM rounds, then
    * Viterbi-segment the WORD TABLE once more under the final model's
    * costs and return (word, n_pieces) — the per-word token counts a
    * caller joins back to the corpus for document-level token/
    * compression stats. Words beyond `maxWordLen` are outside the
    * training universe and absent here too (the caller's join keeps
    * the same universe). */
  def encodeWords(df: DataFrame, textCol: String,
      maxPieceLen: Int = 3, maxWordLen: Int = 12,
      seedMulti: Int = 200, rounds: Int = 2): DataFrame = {
    val (wf, vocab) = emRounds(df, textCol, maxPieceLen, maxWordLen, seedMulti, rounds)
    val finalRows = vocab.collect()
      .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    viterbiSegments(wf, quantizedCosts(finalRows), maxPieceLen, maxWordLen)
      .select(col("word"), size(col("pieces")).cast("long").as("n_pieces"))
  }

  /** Full train: returns the final vocabulary as
    * (piece, cnt, cost BIGINT) — cost quantized from the final counts —
    * top `topK` by (cnt desc, piece asc). */
  def train(df: DataFrame, textCol: String,
      maxPieceLen: Int = 3, maxWordLen: Int = 12,
      seedMulti: Int = 200, rounds: Int = 2, topK: Int = 100): DataFrame = {
    val (_, vocab) = emRounds(df, textCol, maxPieceLen, maxWordLen, seedMulti, rounds)
    val tot = vocab.agg(sum(col("cnt")).cast("double").as("__t"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor(-log(col("cnt").cast("double") / col("__t")) * Quant + 0.5)
          .cast("long").as("cost"))
      .orderBy(col("cnt").desc, col("piece").asc).limit(topK)
  }
}
