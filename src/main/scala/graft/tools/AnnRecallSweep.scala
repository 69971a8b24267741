package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** IVF recall-vs-nProbe operating curve (dev tool, the r14 verdict's
  * optional ask #7): builds the IVF index ONCE over the embeddings
  * table, takes a deterministic query batch, computes exact
  * brute-force ground truth, then sweeps nProbe measuring recall@k
  * and the per-sweep search wall — the table an operator reads to
  * pick nProbe for a latency/recall budget. The index build is
  * deliberately OUTSIDE the per-probe timer (train-once/search-many
  * is the artifact lifecycle `q_ann_ivf_persisted` pins); the searched
  * artifacts are the exact `ivfBuildIndex` frames the production
  * queries persist.
  *
  *   runMain graft.tools.AnnRecallSweep [sfDir] [k] [nCells]
  */
object AnnRecallSweep {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nCells = args.lift(2).map(_.toInt).getOrElse(64)
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

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpusN = emb.count()
    // deterministic query batch, same ids at every scale factor prefix
    val queries = emb.filter(col("vec_id") % 100 === 7).limit(48)
      .localCheckpoint()
    val nQ = queries.count()

    // exact ground truth (one bounded-heap pass — the measured floor
    // of the sweep is also the brute-force wall to beat)
    val tTruth = System.nanoTime()
    val truth = Similarity.bruteForceTopK(
        queries, "vec_id", "embedding", emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truthWall = (System.nanoTime() - tTruth) / 1e9

    val tBuild = System.nanoTime()
    val (anchors0, assigned0) =
      Similarity.ivfBuildIndex(emb, "vec_id", "embedding", nCells)
    val anchors = anchors0.localCheckpoint()
    val assigned = assigned0.localCheckpoint()
    val buildWall = (System.nanoTime() - tBuild) / 1e9

    println(s"\nIVF recall@k=$k vs nProbe — sfDir=$dir corpus=$corpusN " +
      f"queries=$nQ cells=$nCells (index build $buildWall%.2f s, " +
      f"brute-force truth $truthWall%.2f s)")
    println("| nProbe | recall@k | search s | vs brute |")
    println("|---|---|---|---|")
    val rows = Seq(1, 2, 4, 8, 16).filter(_ <= nCells).map { nProbe =>
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val got = Similarity.ivfSearchIndex(
            queries, "vec_id", "embedding", anchors, assigned,
            "vec_id", "embedding", k, nProbe)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val wall = (System.nanoTime() - t0) / 1e9
        val recall = truth.iterator.map { case (q, t) =>
          got.getOrElse(q, Set.empty).count(t).toDouble / t.size
        }.sum / truth.size
        (recall, wall)
      }
      once() // warm the plan shape for this nProbe, off the books
      val (recall, wall) = once()
      println(f"| $nProbe | $recall%.3f | $wall%.3f | ${wall / truthWall}%.2fx |")
      (nProbe, recall, wall)
    }
    val json = rows.map { case (p, r, w) =>
      f"""{"nprobe":$p,"recall":$r%.3f,"search_s":$w%.3f}""" }.mkString(",")
    println(
      f"""{"k":$k,"cells":$nCells,"corpus":$corpusN,"queries":$nQ,"brute_s":$truthWall%.3f,"build_s":$buildWall%.3f,"sweep":[$json]}""")

    // ---- quantized variants at EQUAL nProbe and EQUAL code size ------
    // (r15 verdict optional #7: put the rotation's operating gain — and
    // r16's residual encoding — ON the curve, not just in one-off
    // probes.) All three share m=8 int codes per vector; PQ and
    // residual share the SAME coarse cells, OPQ trains its own cells in
    // the rotated space (the q_ann_opq_ivf composition). Ground truth
    // here is exact L2 (the metric ADC approximates); the flat sweep
    // above stays on its cosine truth — the two tables answer different
    // questions (cell pruning loss vs quantizer loss).
    val (m, subDim, c) = (8, 8, 8)
    val pqCells = math.min(nCells, 16)
    val train = emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
    val cells: Seq[(Long, Array[Float])] =
      Similarity.kmeansCentroids(train, "vec_id", "embedding", pqCells, iters = 2)
        .map { case (id, v) => id -> v.map(_.toFloat).toArray }
    val rawCb = Similarity.trainPqCodebooks(
      train, "vec_id", "embedding", m, subDim, c, iters = 2)
    val resCb = Similarity.trainResidualPqCodebooks(
      train, "vec_id", "embedding", cells, m, subDim, c, iters = 2)
    val (rot, opqCb) = Similarity.trainOpqRotation(
      train, "vec_id", "embedding", m, subDim, c, opqIters = 4, pqIters = 2)
    val rotExpr = Similarity.rotateVec(col("embedding"), rot)
    val embRot = emb.select(col("vec_id"), rotExpr.as("remb")).localCheckpoint()
    val cellsRot: Seq[(Long, Array[Float])] =
      Similarity.kmeansCentroids(
        embRot.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096),
        "vec_id", "remb", pqCells, iters = 2)
        .map { case (id, v) => id -> v.map(_.toFloat).toArray }
    val idxPq = Similarity.ivfPqBuildIndex(
      emb, "vec_id", "embedding", cells, rawCb, m, subDim).localCheckpoint()
    val idxRes = Similarity.ivfPqResidualBuildIndex(
      emb, "vec_id", "embedding", cells, resCb, m, subDim).localCheckpoint()
    val idxOpq = Similarity.ivfPqBuildIndex(
      embRot, "vec_id", "remb", cellsRot, opqCb, m, subDim).localCheckpoint()
    // r16: the full composed chain — rotated residuals against a
    // residual codebook trained in the rotated space, same cells as
    // the OPQ column so the delta vs OPQ+IVF is residual encoding alone
    val opqResCb = Similarity.trainResidualPqCodebooks(
      embRot.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096),
      "vec_id", "remb", cellsRot, m, subDim, c, iters = 2)
    val idxOpqRes = Similarity.ivfPqResidualBuildIndex(
      embRot, "vec_id", "remb", cellsRot, opqResCb, m, subDim).localCheckpoint()

    // exact L2 ground truth for the quantized table (rotation is
    // orthogonal: L2 neighbors are identical in both spaces)
    val all = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qIds = queries.select("vec_id").collect().map(_.getLong(0)).toSet
    val l2Truth = all.filter(t => qIds(t._1)).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid).map { case (id, v) =>
        var d = 0.0; var i = 0
        while (i < v.length) { val x = qv(i).toDouble - v(i).toDouble; d += x * x; i += 1 }
        (d, id)
      }.sortBy(identity).take(k).map(_._2).toSet
    }.toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      l2Truth.iterator.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t).toDouble / t.size
      }.sum / l2Truth.size
    }
    val qRot = embRot.filter(col("vec_id").isin(qIds.toSeq: _*))
    println(s"\nIVF-PQ recall@k=$k vs nProbe at equal code size " +
      s"(m=$m ints/vector, cells=$pqCells; truth = exact L2)")
    println("| nProbe | recall PQ | recall residual | recall OPQ+IVF | recall OPQ+resid |")
    println("|---|---|---|---|---|")
    val qrows = Seq(1, 2, 4, 8, 16).filter(_ <= pqCells).map { nProbe =>
      val rPq = recallOf(Similarity.ivfPqSearchIndex(
        idxPq, queries, "vec_id", "embedding", cells, rawCb, k, nProbe, m, subDim))
      val rRes = recallOf(Similarity.ivfPqResidualSearchIndex(
        idxRes, queries, "vec_id", "embedding", cells, resCb, k, nProbe, m, subDim))
      val rOpq = recallOf(Similarity.ivfPqSearchIndex(
        idxOpq, qRot, "vec_id", "remb", cellsRot, opqCb, k, nProbe, m, subDim))
      val rOpqRes = recallOf(Similarity.ivfPqResidualSearchIndex(
        idxOpqRes, qRot, "vec_id", "remb", cellsRot, opqResCb, k, nProbe, m, subDim))
      println(f"| $nProbe | $rPq%.3f | $rRes%.3f | $rOpq%.3f | $rOpqRes%.3f |")
      (nProbe, rPq, rRes, rOpq, rOpqRes)
    }
    val qjson = qrows.map { case (p, a, b, o, or) =>
      f"""{"nprobe":$p,"recall_pq":$a%.3f,"recall_residual":$b%.3f,"recall_opq":$o%.3f,"recall_opq_residual":$or%.3f}""" }
      .mkString(",")
    println(f"""{"k":$k,"pq_cells":$pqCells,"m":$m,"quantized_sweep":[$qjson]}""")
    spark.stop()
  }
}
