package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive training: pair every
  * document (anchor) with `k` pseudo-random other documents from the
  * corpus — the in-batch-negatives precompute for embedding /
  * retrieval training, done corpus-wide without any driver-side
  * collect.
  *
  * Shape, built for 100 TB:
  *   1. assign every row a dense 0-based index in id order
  *      ([[Packing.withDenseIndex]] — distributed prefix sum, no global
  *      window);
  *   2. each anchor derives its k probe indexes as a pure column
  *      expression, LCG-style: (a·(idx·k + j) + b) mod n — no RNG
  *      state, reproducible run-to-run, SQL-replayable;
  *   3. one equi-join of the probes against the (index → id) table
  *      resolves negative ids — a hash join on a dense long key,
  *      uniformly distributed by construction (no skew: every index is
  *      probed ≈ k times in expectation).
  *
  * Sampling is WITH replacement (two probes of one anchor can collide),
  * the standard contrastive setup; a probe that lands on the anchor
  * itself moves to the next index mod n. The multiplier bounds the
  * exact-arithmetic range to idx·k + j < 2^63 / a ≈ 3.5e9 — beyond
  * that (trillion-doc corpora), swap the probe for
  * `pmod(xxhash64(idx * k + j), n)`: same plan, wraparound semantics,
  * no SQL oracle.
  */
object Contrastive {

  def negativeSamples(
      df: DataFrame,
      idCol: String,
      k: Int,
      mulA: Long = 2654435761L, // Knuth's 2^32 / phi multiplier
      addB: Long = 97L,
      numPartitions: Option[Int] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val indexed = Packing
      .withDenseIndex(df.select(col(idCol)), idCol, "__idx", numPartitions)
      .persist()
    // the validation actions can throw (duplicate ids, null-id
    // raise_error inside the prefix sum) — without the catch every
    // failed call leaked the just-persisted frame into the cache
    // manager for the session's lifetime (review r6)
    val n = try {
      val n0 = indexed.count() // also materializes the cache
      // withDenseIndex's prefix sum is order-ambiguous under duplicate
      // ids: a probe could resolve to the anchor's own duplicate (self
      // pair) and index assignment would be unstable run-to-run — fail
      // loudly; the distinct count reads from the cache just built
      val nDistinct = indexed.select(col(idCol)).distinct().count()
      require(nDistinct == n0,
        s"negativeSamples requires unique $idCol values: $n0 rows but $nDistinct distinct")
      n0
    } catch { case e: Throwable => indexed.unpersist(); throw e }
    if (n < 2) { // no other rows to sample: empty result, fixed schema
      indexed.unpersist()
      return indexed.sparkSession.emptyDataFrame
        .select(lit(null).cast(df.schema(idCol).dataType).as("anchor_id"),
          lit(0L).as("neg_rank"),
          lit(null).cast(df.schema(idCol).dataType).as("negative_id"))
    }
    val aEff = try {
      // the LCG's uniformity needs gcd(a, n) = 1 — n a multiple of
      // mulA (or a caller multiplier sharing a factor with n) collapses
      // the probe sequence onto n/gcd residues, in the worst case ONE
      // constant negative for the whole corpus plus a single hot join
      // key. (mulA % n)·x ≡ mulA·x (mod n), so reducing first and
      // walking to the next coprime changes NOTHING whenever the
      // default (prime) multiplier is already coprime (review r12).
      // a = mulA % n whenever that is a non-degenerate coprime — the
      // common case, and the only one the exact-BIGINT oracle replays
      // (the oracle multiplies by mulA directly, ≡ mod n). Otherwise
      // (shared factor, or the degenerate 0/1 residues whose LCG is
      // constant/sequential) walk to a coprime from a MIXED start:
      // incrementing from the bad residue settled on a = 1 for
      // n | mulA, degenerating the probe sequence to near-sequential
      // dense indices — uniform, but unscrambled (review r13). n ≤ 2
      // has no multiplier > 1; a = 1 is the only (correct) choice.
      val r0 = mulA % n
      val a =
        if (r0 > 1 && BigInt(r0).gcd(BigInt(n)) == 1) r0
        else {
          val mix = Math.floorMod(
            java.lang.Long.reverse(mulA) * 0x9E3779B97F4A7C15L, n)
          Iterator.iterate(mix)(x => (x + 1) % n)
            .find(x => (x > 1 || n <= 2) && x != 0 &&
              BigInt(x).gcd(BigInt(n)) == 1).get
        }
      // the probe index idx*k + j must stay within 2^63/a or the
      // multiply wraps (non-ANSI: silently diverging from the documented
      // (a*x+b) mod n distribution and the exact-BIGINT oracle; ANSI:
      // a mid-job overflow error) — the doc stated the bound, nothing
      // enforced it (review r6)
      require(n <= Long.MaxValue / a / k,
        s"negativeSamples: n = $n at k = $k exceeds the exact-arithmetic " +
          s"bound ${Long.MaxValue / a / k} — shard the corpus or reduce k")
      a
    } catch { case e: Throwable => indexed.unpersist(); throw e }
    val lookup = indexed.select(col("__idx").as("__nidx"), col(idCol).as("negative_id"))
    val probes = indexed
      .select(col(idCol).as("anchor_id"), col("__idx"),
        explode(sequence(lit(0L), lit(k - 1L))).as("neg_rank"))
      .withColumn("__h",
        pmod(lit(aEff) * (col("__idx") * lit(k.toLong) + col("neg_rank")) + lit(addB), lit(n)))
      .withColumn("__nidx",
        when(col("__h") === col("__idx"), pmod(col("__h") + 1, lit(n)))
          .otherwise(col("__h")))
    val out = probes.join(lookup, "__nidx")
      .select(col("anchor_id"), col("neg_rank"), col("negative_id"))
    Dedup.unpersistAfterFirstUse(out, indexed)
  }
}
