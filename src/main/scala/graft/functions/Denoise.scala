package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Denoising training-pair construction — T5/UL2-style span corruption
  * (Raffel et al. 2020 §3.1.4): mask contiguous word spans, replace
  * each with a sentinel token in the INPUT, and emit the masked spans
  * behind their sentinels as the TARGET.
  *
  * The corruption schedule is DETERMINISTIC and block-local: word
  * positions partition into fixed blocks of `blockSize`; block k of
  * document d masks the span starting at in-block offset
  * (d·1009 + k·9176) mod 13 with length 2 + ((d + k) mod 3). One span
  * per block, spans never cross blocks (13 + 4 ≤ 16), so every
  * position's mask state is pure per-position ARITHMETIC — the whole
  * construction is one projection of higher-order array expressions
  * over the corpus scan: no join, no shuffle, no randomness to
  * reconcile across engines
  * (the negative-sampling LCG precedent: an explicit integer schedule
  * replayable exactly by the SQL oracle). ~19% of words mask at the
  * default constants (3/16 average span over 16-word blocks), the T5
  * neighborhood.
  *
  * Scale shape: per-row higher-order-function expressions over the
  * text column — embarrassingly parallel, output rows = input rows.
  */
object Denoise {

  val BlockSize = 16
  val OffsetMod = 13 // in-block span start ∈ [0, 13)
  val LenBase = 2 // span length ∈ [2, 4]
  val LenMod = 3

  /** (idCol, n_words, n_masked, input_text, targets) per document.
    * Sentinels are `<extra_id_K>` with K = the span's block index —
    * unique per document, ordered left-to-right like the spans. */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = col(idCol).cast("long")
    // null text = zero words (the oracle states the same COALESCE): a
    // null words array would otherwise null-propagate through every
    // output column on one engine and empty-propagate on the other
    val words = coalesce(TextFunctions.words(col(textCol)),
      typedlit(Seq.empty[String]))
    val n = size(words)

    // k rides as an INT (sequence element / floored position); the
    // 9176 multiply must run in LONG or it wraps for block indexes
    // past ~234k (~3.7M-word documents — plausible in noisy crawls)
    // while the oracle's BIGINT schedule doesn't (review r13)
    def s(k: Column) = pmod(d * 1009 + k.cast("long") * 9176L, lit(OffsetMod))
    def len(k: Column) = lit(LenBase) + pmod(d + k, lit(LenMod))
    def lo(k: Column) = k * BlockSize + s(k)
    def hi(k: Column) = least(lo(k) + len(k), n)
    def sentinel(k: Column) =
      concat(lit("<extra_id_"), k.cast("string"), lit(">"))

    // Column `/` is DOUBLE division — block ids ride exact floor
    // arithmetic instead
    val nBlocks = floor((n + lit(BlockSize - 1)) / lit(BlockSize)).cast("int")
    // blocks whose span actually starts inside the document
    val spans = when(n > 0,
      filter(sequence(lit(0), nBlocks - 1), k => lo(k) < n))
      .otherwise(typedlit(Seq.empty[Int]))

    // input: every position either passes through, opens a span (the
    // sentinel), or sits inside a span (dropped)
    val inputTokens = when(n > 0,
      filter(
        transform(sequence(lit(0), n - 1), { p =>
          val k = floor(p / lit(BlockSize)).cast("int")
          val off = pmod(p, lit(BlockSize))
          val masked = off >= s(k) && off < s(k) + len(k)
          when(masked && off === s(k), sentinel(k))
            .when(masked, lit(null))
            .otherwise(element_at(words, p + 1))
        }),
        t => t.isNotNull))
      .otherwise(typedlit(Seq.empty[String]))

    val targets = transform(spans, k =>
      concat(sentinel(k), lit(" "),
        array_join(slice(words, lo(k) + 1, hi(k) - lo(k)), " ")))

    df.select(col(idCol),
      n.cast("long").as("n_words"),
      aggregate(spans, lit(0L), (acc, k) => acc + (hi(k) - lo(k)))
        .as("n_masked"),
      array_join(inputTokens, " ").as("input_text"),
      array_join(targets, " ").as("targets"))
  }
}
