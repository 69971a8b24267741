package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomJoin, Cluster, VectorSketch}

/** Unit tests for the cluster-quality / embedding-prep / runtime-filter
  * operators (silhouette, per-dim standardization, bloom semi-join
  * pruning, PMI collocations). */
class ClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("simplifiedSilhouette: separated clusters score near 1, swapped labels negative") {
    import spark.implicits._
    // two tight clusters far apart in 4-d
    def around(c: Array[Float], i: Int): Array[Float] =
      c.zipWithIndex.map { case (v, d) => v + ((i * 7 + d) % 3 - 1) * 0.01f }
    val c0 = Array(10f, 0f, 0f, 0f)
    val c1 = Array(0f, 10f, 0f, 0f)
    val clean = ((0 until 20).map(i => (i.toLong, around(c0, i), 0)) ++
      (0 until 20).map(i => (100L + i, around(c1, i), 1)))
      .toDF("vec_id", "embedding", "label")
    val sil = Cluster.simplifiedSilhouette(clean, "embedding", "label").collect()
    assert(sil.length == 2)
    sil.foreach(r => assert(r.getDouble(2) > 0.9,
      s"clean cluster ${r.getLong(0)} silhouette ${r.getDouble(2)} should be ~1"))

    // label 1's points actually sit AT cluster 0 → silhouette negative
    val swapped = ((0 until 20).map(i => (i.toLong, around(c0, i), 0)) ++
      (0 until 20).map(i => (100L + i, around(c0, i), 1)) ++
      (0 until 20).map(i => (200L + i, around(c1, i), 2)))
      .toDF("vec_id", "embedding", "label")
    val s2 = Cluster.simplifiedSilhouette(swapped, "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // labels 0 and 1 overlap completely: both centroids coincide at c0,
    // so a≈b → silhouette ≈ 0; the coherent label 2 stays high
    assert(math.abs(s2(0L)) < 0.2 && math.abs(s2(1L)) < 0.2,
      s"overlapping labels should score ~0, got $s2")
    assert(s2(2L) > 0.9, s"coherent label should stay ~1, got ${s2(2L)}")
  }

  test("standardizeDims: output dims have mean ~0 and sd ~1, constant dim is NULL") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // dim 0: N(5, 2)-ish, dim 1: N(-3, 0.5)-ish, dim 2: constant
    val df = (0 until 200).map { i =>
      (i.toLong, Array(5f + 2f * rnd.nextGaussian().toFloat,
        -3f + 0.5f * rnd.nextGaussian().toFloat, 4.2f))
    }.toDF("vec_id", "embedding")
    val z = VectorSketch.standardizeDims(df, "vec_id", "embedding")
    val stats = z.groupBy("pos").agg(
      avg("z").as("m"), stddev_pop("z").as("sd"),
      sum(col("z").isNull.cast("int")).as("nulls"))
      .collect().map(r => r.getInt(0) ->
        (r.get(1), Option(r.get(2)), r.getLong(3))).toMap
    for (d <- Seq(0, 1)) {
      val (m, sd, nulls) = stats(d)
      assert(math.abs(m.asInstanceOf[Double]) < 1e-4, s"dim $d mean $m")
      assert(math.abs(sd.get.asInstanceOf[Double] - 1.0) < 1e-3, s"dim $d sd $sd")
      assert(nulls == 0)
    }
    assert(stats(2)._3 == 200L, "constant dim must standardize to NULL")
  }

  test("graph/shard/silhouette degenerate-input contracts (review r6)") {
    import spark.implicits._
    // a self-loop-only node keeps its own community instead of
    // vanishing; the triangle (odd cycle — sync LPA oscillates on
    // bipartite shapes) converges to one community
    val edges = Seq((1L, 1L), (2L, 3L), (3L, 4L), (4L, 2L)).toDF("s", "d")
    val comm = graft.functions.Graph.labelPropagation(edges, "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comm.keySet === Set(1L, 2L, 3L, 4L), s"self-loop-only node lost: $comm")
    assert(comm(1L) === 1L && Set(comm(2L), comm(3L), comm(4L)).size === 1)
    // null keys get a NULL shard, not a deterministic hotspot
    val shards = Seq(Some(7L), None).toDF("k")
      .select(graft.functions.Sharding.rendezvousShard(col("k"), 8).as("s"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(shards(0).isDefined && shards(1).isEmpty)
    // bloom prune validates key types BEFORE any job
    val strDf = Seq(("a", 1L)).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException](
      graft.functions.BloomJoin.pruneByBloom(strDf, "k", strDf, "k"))
    assert(e1.getMessage.contains("integral"))
    // silhouette: null vectors are excluded, not scored +1.0; string
    // labels rejected at plan time
    val withNullVec = Seq(
      (0, Array(10f, 0f)), (0, Array(10.01f, 0f)), (0, null.asInstanceOf[Array[Float]]),
      (1, Array(0f, 10f)), (1, Array(0f, 10.01f)))
      .toDF("label", "embedding")
    val sil = graft.functions.Cluster.simplifiedSilhouette(withNullVec, "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sil(0L) === 2L, "null-vector row must not be scored")
    intercept[IllegalArgumentException](graft.functions.Cluster.simplifiedSilhouette(
      Seq(("spam", Array(1f))).toDF("label", "embedding"), "embedding", "label"))
  }

  test("bloom prune keeps every true match and drops most non-matches") {
    import spark.implicits._
    val dim = (0L until 100L).filter(_ % 10 == 0).toDF("k") // 10 selective keys
    val fact = (0L until 10000L).map(i => (i % 100, i)).toDF("fk", "payload")
    val pruned = BloomJoin.pruneByBloom(fact, "fk", dim, "k", fpp = 0.01)
    val prunedRows = pruned.count()
    val exact = fact.join(dim, col("fk") === col("k")).count()
    // superset of the semi-join…
    val missing = fact.join(dim, col("fk") === col("k")).as("m")
      .join(pruned, Seq("fk", "payload"), "left_anti").count()
    assert(missing == 0, "bloom pruning must never drop a true match")
    // …but close to it: ~10% of rows match; allow fpp slack
    assert(prunedRows >= exact && prunedRows < exact + 500,
      s"pruned $prunedRows vs exact-match $exact — filter isn't selective")
    // exact join after pruning == exact join without pruning
    val a = pruned.join(dim, col("fk") === col("k")).agg(sum("payload")).head.getLong(0)
    val b = fact.join(dim, col("fk") === col("k")).agg(sum("payload")).head.getLong(0)
    assert(a == b)
  }

  test("collocationPmi ranks a planted collocation first") {
    import spark.implicits._
    // "hong kong" always adjacent and exclusive; filler tokens common
    val docsDf = (0 until 40).map { i =>
      val filler = Seq("the", "cat", "sat", "on", "mat", "dog", "ran")
      val w = scala.util.Random.shuffle(filler ++ filler).mkString(" ")
      (i.toLong, s"$w hong kong $w")
    }.toDF("doc_id", "text")
    val words = docsDf.select(col("doc_id"),
      graft.functions.TextFunctions.words(col("text")).as("__ws"))
    val top = graft.queries.PipelineQueries
      .collocationPmiFrom(words, minCount = 5, topK = 5)
      .collect()
    assert(top.nonEmpty)
    assert(top.head.getString(0) == "hong" && top.head.getString(1) == "kong",
      s"expected planted collocation first, got ${top.head}")
  }
}
