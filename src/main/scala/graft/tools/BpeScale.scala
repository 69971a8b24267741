package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.Bpe

/** BPE train wall-clock at REALISTIC merge counts (dev tool, VERDICT
  * r14 #5): the exact sequential trainer dispatches one pair-count job
  * + one 1-row argmax collect + one checkpointed apply PER MERGE — data
  * volume per round is only the word-frequency table, so at hundreds
  * of merges the wall is pure driver dispatch. This measures the
  * sequential trainer and the batched trainer
  * ([[Bpe.trainMergesOnWordsBatched]], top-k pairwise-disjoint merges
  * per round) at two merge counts, so BENCH_NOTES can pin (a) the
  * per-merge dispatch constant, (b) near-linearity of train wall in
  * merges, (c) the ~batchK× round reduction the batched path buys.
  * Fidelity: batched ≡ sequential when a round's top picks are
  * symbol-disjoint (spec-pinned in PipelineSpec); exact training stays
  * on the sequential path, which remains the oracle-gated one.
  *
  *   runMain graft.tools.BpeScale [sfDir] [mergesLo] [mergesHi] [batchK]
  */
object BpeScale {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val mergesLo = args.lift(1).map(_.toInt).getOrElse(64)
    val mergesHi = args.lift(2).map(_.toInt).getOrElse(256)
    val batchK = args.lift(3).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)

    // The corpus scan is paid ONCE outside every timer (both trainers
    // share it via trainMergesOnWords*) — the measurement target is the
    // merge LOOP, where the r14 verdict located the wall. The testdata
    // documents carry only 31 distinct words (synthetic generator), so
    // BPE EXHAUSTS near ~90 merges there — a multi-hundred-merge
    // measurement needs a rich vocabulary. `synth:<n>` builds a
    // deterministic n-word Zipf table (md5-hex words: 16-symbol
    // alphabet, deep pair diversity), which is the honest instrument:
    // the trainer's input IS the (word, freq) table, and per-round
    // data volume is vocabulary-grain either way.
    import org.apache.spark.sql.functions._
    val wf = (if (dir.startsWith("synth:")) {
      val n = dir.stripPrefix("synth:").toInt
      spark.range(1, n + 1L)
        .select(substring(md5(col("id").cast("string")), 1, 10).as("word"),
          (lit(n.toLong) / col("id")).cast("long").as("freq"))
    } else {
      Bpe.wordFreq(
        spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
        "text")
    }).localCheckpoint()

    def wall[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm: analyzer/codegen JIT for both plan shapes, off the books
    Bpe.trainMergesOnWords(wf, 3).collect()
    Bpe.trainMergesOnWordsBatched(wf, 3, batchK).collect()

    def row(merges: Int): (Double, Double, Long) = {
      val seq = wall(Bpe.trainMergesOnWords(wf, merges).collect())
      var learned = 0L
      val bat = wall {
        learned = Bpe.trainMergesOnWordsBatched(wf, merges, batchK).count()
      }
      System.err.println(
        f"[bpescale] merges=$merges seq=$seq%.1fs batched=$bat%.1fs " +
          f"(k=$batchK, learned=$learned) speedup=${seq / bat}%.1fx " +
          f"seq_per_merge=${seq / merges * 1000}%.0fms")
      (seq, bat, learned)
    }
    val (seqLo, batLo, _) = row(mergesLo)
    val (seqHi, batHi, learnedHi) = row(mergesHi)
    println(
      f"""{"batch_k":$batchK,"lo":{"merges":$mergesLo,"seq_s":$seqLo%.2f,"batched_s":$batLo%.2f},"hi":{"merges":$mergesHi,"seq_s":$seqHi%.2f,"batched_s":$batHi%.2f,"learned":$learnedHi},"seq_linearity":${seqHi / seqLo}%.2f,"batched_linearity":${batHi / batLo}%.2f,"speedup_hi":${seqHi / batHi}%.2f}""")
    spark.stop()
  }
}
