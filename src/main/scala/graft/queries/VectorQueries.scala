package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorSketch
import graft.sources.Tables

/** Embedding-sketch queries over the embeddings table: JL random
  * projection and product-quantization encoding. Both oracles replay
  * the identical left-associative double arithmetic, so the float
  * outputs are compared exactly (same policy as q_embedding_quantize /
  * q_ann_brute_force).
  */
object VectorQueries {

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  private val Dim = 64

  // ---- Johnson–Lindenstrauss random projection -----------------------

  private val RpK = 8
  private lazy val RpSigns = VectorSketch.signMatrix(RpK, Dim)

  /** 64-dim float embeddings sketched to 8 dims with a deterministic
    * Rademacher ±1 matrix (md5-parity entries — see
    * [[VectorSketch.rademacherSign]]). The oracle embeds the same ±1
    * literals, so every output double is bit-identical. */
  def randomProjection(s: SparkSession, dir: String): DataFrame =
    embs(s, dir).select(
      col("vec_id") +:
        (0 until RpK).map(j =>
          VectorSketch.projectDim(col("embedding"), RpSigns(j)).as(s"p_$j")): _*)
    // r17: no trailing orderBy — it existed only to make output order
    // deterministic, which the oracle gate never observes (both sides
    // are compared sorted), and it cost a range-sampling job + a full
    // exchange + sort of the projected output (guide §2.4 "an orderBy
    // used only to make output deterministic"). Same rows; the oracle
    // SQL keeps its ORDER BY (DuckDB side unchanged). This was the one
    // ScaleCheck row still >5x under the isolated instrument — both
    // its walls were floor-scale, and the sort's extra job + exchange
    // was most of the 10x side.

  val randomProjectionSql: String = {
    val dims = (0 until RpK).map { j =>
      val terms = (0 until Dim).map { i =>
        val sgn = if (RpSigns(j)(i) > 0) "" else "-"
        s"(${sgn}CAST(embedding[${i + 1}] AS DOUBLE))"
      }
      s"${terms.mkString(" + ")} AS p_$j"
    }
    s"""SELECT vec_id,
       |${dims.mkString(",\n")}
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  // ---- product quantization -----------------------------------------

  private val PqM = 8        // subvectors
  private val PqSubDim = 8   // dims per subvector (8×8 = 64)
  private val PqC = 8        // anchors per subquantizer

  /** PQ encoding with deterministic anchors: the codebook for every
    * subquantizer is the corresponding subvector of the first `PqC`
    * vectors by vec_id (same deterministic-anchor construction as the
    * value-oracled IVF variant — a production build swaps in per-sub
    * k-means centroids, which changes only the literal matrix). Emits
    * the m-part code word per vector. */
  def pqEncode(s: SparkSession, dir: String): DataFrame = {
    val anchors: Array[Array[Float]] = embs(s, dir)
      .orderBy("vec_id").limit(PqC)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    embs(s, dir).select(
      col("vec_id"),
      VectorSketch.pqCode(col("embedding"), anchors, PqM, PqSubDim).as("pq_code"))
      .orderBy("vec_id")
  }

  /** The oracle derives the same anchors from the table itself (first
    * PqC rows by vec_id), computes the same left-associative squared-L2
    * per (vector, subvector, anchor), and picks the argmin with the
    * same smallest-index tie-break via ROW_NUMBER ordered (dist, aidx). */
  val pqEncodeSql: String = {
    val diffTerms = (1 to PqSubDim).map { d =>
      val idx = s"t.s * $PqSubDim + $d"
      s"((CAST(e.embedding[$idx] AS DOUBLE) - CAST(a.aemb[$idx] AS DOUBLE)) * " +
        s"(CAST(e.embedding[$idx] AS DOUBLE) - CAST(a.aemb[$idx] AS DOUBLE)))"
    }
    s"""WITH a AS (
       |  SELECT aemb, ROW_NUMBER() OVER (ORDER BY avid) - 1 AS aidx
       |  FROM (SELECT vec_id AS avid, embedding AS aemb
       |        FROM embeddings ORDER BY vec_id LIMIT $PqC)),
       |d AS (
       |  SELECT e.vec_id, t.s, a.aidx,
       |         ${diffTerms.mkString(" + ")} AS dist
       |  FROM embeddings e
       |  CROSS JOIN a, UNNEST(range(0, $PqM)) AS t(s)),
       |r AS (
       |  SELECT vec_id, s, aidx,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, aidx) AS rn
       |  FROM d)
       |SELECT vec_id,
       |       string_agg(CAST(aidx AS VARCHAR), '-' ORDER BY s) AS pq_code
       |FROM r WHERE rn = 1
       |GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  // ---- PQ asymmetric-distance (ADC) search ---------------------------

  private val AdcQ = 4  // query vectors: vec_id < AdcQ
  private val AdcK = 5

  /** ANN top-k over PQ codes with asymmetric distance: anchors are the
    * deterministic first-PqC codebook (same construction as
    * [[pqEncode]] — a production build swaps in k-means subquantizer
    * centroids, changing only the literal matrix), queries are the
    * first AdcQ vectors, distances are Σ_s LUT[s][code_s]. The scale
    * story is the point: the corpus is scanned as m int codes (not
    * dim floats), all queries score in one pass, and the top-k is the
    * two-level skew-safe reduction. */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val anchors: Array[Array[Float]] = e
      .orderBy("vec_id").limit(PqC)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.pqAdcTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding",
        anchors, PqM, PqSubDim, k = AdcK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** ADC search with TRAINED per-subquantizer k-means codebooks
    * ([[Similarity.trainPqCodebooks]], 2 Lloyd iterations from the
    * deterministic first-c init) — the production PQ quality path the
    * first-c variants only stand in for. The trained codebook (tiny:
    * c×dim floats) is staged as a parquet artifact and READ BACK for
    * encoding, so engine and oracle score from byte-identical floats:
    * distributed k-means averaging is ulp-sensitive to partition
    * layout ([[Similarity.kmeansCentroids]] note), so the oracle
    * replays encode + LUT + ADC exactly from the staged values (the
    * q_dedup_simhash staging pattern) — a hash match proves the whole
    * scoring machinery bit-identical downstream of training, and the
    * codebook QUALITY is pinned by PipelineSpec's trainPqCodebooks
    * floors (distortion strictly below first-c, recall@5 no worse,
    * iters=0 ≡ first-c, emptied centroids keep their value). */
  /** Stage (or reuse) the trained PQ codebook artifact for `dir` and
    * return its path — shared by [[annPqTrained]] and
    * [[annIvfPqTrained]], so both queries score (and both oracles
    * replay) from ONE set of trained floats. */
  private def stagedPqCodebook(s: SparkSession, dir: String): String = {
    val stage = Staging.pathFor(dir, "pq_codebook_v1", "embeddings.parquet")
    Staging.publishOnce(stage) { tmp =>
      // bounded deterministic training sample — the documented 100 TB
      // shape (codebook quality needs thousands of points per
      // centroid, not the corpus): hash-ordered top-k, one scan, no
      // full sort, stable across partition layouts
      val train = embs(s, dir)
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
      val cb = graft.functions.Similarity.trainPqCodebooks(
        train, "vec_id", "embedding", PqM, PqSubDim, PqC, iters = 2)
      import s.implicits._
      cb.zipWithIndex
        .map { case (a, j) => (j.toLong, a.toSeq) }
        .toSeq.toDF("aidx", "aemb")
        .write.mode("overwrite").parquet(tmp)
    }
    stage
  }

  def annPqTrained(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val stage = stagedPqCodebook(s, dir)
    val anchors: Array[Array[Float]] = s.read.parquet(stage)
      .orderBy("aidx").select("aemb").collect()
      .map(_.getSeq[Float](0).toArray)
    pqTrainedStage = stage
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.pqAdcTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding",
        anchors, PqM, PqSubDim, k = AdcK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  @volatile private var pqTrainedStage =
    Staging.pathFor("/root/testdata/sf0.01", "pq_codebook_v1", "embeddings.parquet")

  // ---- OPQ: trained orthogonal pre-rotation in front of PQ-ADC -------

  /** Stage (or reuse) the OPQ artifact for `dir` — a three-part stage
    * under one publishOnce root: `rotation/` (the trained dim×dim R,
    * [[graft.functions.Similarity.trainOpqRotation]] — alternating
    * Procrustes/PQ from the identity, argmin-selected so distortion is
    * never worse than plain PQ), `codebook/` (the codebooks trained on
    * the rotated sample), and `rotated/` (the corpus PRE-ROTATED by the
    * production [[graft.functions.Similarity.rotateVec]] expression).
    * Rotation training is ulp-sensitive (driver SVD), so the oracle
    * replays encode + LUT + ADC from the staged rotated floats + staged
    * codebooks — the q_ann_pq_trained contract one notch up: the hash
    * match proves the engine's IN-FLIGHT rotation is plan-stable (its
    * floats must equal the staging pass's bit-for-bit) and every
    * scoring step downstream bit-identical; the rotation MATH itself
    * (driver-twin parity, orthogonality, distortion ≤ plain PQ) is
    * pinned in PipelineSpec. */
  private def stagedOpq(s: SparkSession, dir: String): String = {
    val stage = Staging.pathFor(dir, "opq_v1", "embeddings.parquet")
    Staging.publishOnce(stage) { tmp =>
      val train = embs(s, dir)
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
      val (r, cb) = graft.functions.Similarity.trainOpqRotation(
        train, "vec_id", "embedding", PqM, PqSubDim, PqC,
        opqIters = 4, pqIters = 2)
      import s.implicits._
      r.zipWithIndex.map { case (row, i) => (i.toLong, row.toSeq) }
        .toSeq.toDF("ridx", "rrow").write.parquet(s"$tmp/rotation")
      cb.zipWithIndex.map { case (a, j) => (j.toLong, a.toSeq) }
        .toSeq.toDF("aidx", "aemb").write.parquet(s"$tmp/codebook")
      embs(s, dir).select(col("vec_id"),
        graft.functions.Similarity.rotateVec(col("embedding"), r).as("remb"))
        .write.parquet(s"$tmp/rotated")
      // multi-part stage: parquet's per-part _SUCCESS files sit in the
      // subdirs, but publishOnce keys on a ROOT _SUCCESS
      java.nio.file.Files.createFile(java.nio.file.Paths.get(tmp, "_SUCCESS"))
    }
    stage
  }

  /** PQ-ADC search under the TRAINED OPQ rotation: rotate queries and
    * corpus in-flight with the production expression (the staged
    * rotated table is the oracle's replay source only), then the
    * machinery is plain [[graft.functions.Similarity.pqAdcTopK]] over
    * the OPQ codebooks — the missing fidelity notch between PQ and a
    * learned transform (r14 verdict's optional ask). */
  /** One float-matrix artifact load — rows ordered by `orderCol`,
    * each `valCol` an array<float>. Bounded by construction (dim rows
    * for a rotation, m·c rows for a codebook). */
  private def loadFloatRows(s: SparkSession, path: String,
      orderCol: String, valCol: String): Array[Array[Float]] =
    s.read.parquet(path).orderBy(orderCol).select(valCol).collect()
      .map(_.getSeq[Float](0).toArray)

  def annOpq(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val stage = stagedOpq(s, dir)
    opqStage = stage
    val r = loadFloatRows(s, s"$stage/rotation", "ridx", "rrow")
    val anchors = loadFloatRows(s, s"$stage/codebook", "aidx", "aemb")
    val rot = graft.functions.Similarity.rotateVec(col("embedding"), r)
    val corpus = e.select(col("vec_id"), rot.as("remb"))
    val q = e.filter(col("vec_id") < AdcQ).select(col("vec_id"), rot.as("remb"))
    graft.functions.Similarity.pqAdcTopK(
        q, "vec_id", "remb", corpus, "vec_id", "remb",
        anchors, PqM, PqSubDim, k = AdcK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  @volatile private var opqStage =
    Staging.pathFor("/root/testdata/sf0.01", "opq_v1", "embeddings.parquet")

  /** The oracle replays encode + LUT + ADC over the STAGED rotated
    * vectors and staged codebooks — identical scoring SQL to
    * [[annPqSql]], vector source swapped for the rotated artifact. */
  def annOpqSql: String = annPqSqlFrom(
    s"SELECT aidx, aemb FROM '$opqStage/codebook/*.parquet'",
    s"(SELECT vec_id, remb AS embedding FROM '$opqStage/rotated/*.parquet')")

  /** The full FAISS-style `OPQ,IVF,PQ` index-factory composition: the
    * trained rotation in front of coarse-quantized (IVF) PQ-ADC.
    * Coarse cells are k-means centroids trained on the ROTATED sample
    * (staged next to the OPQ artifact); corpus and queries rotate
    * in-flight with the production expression and every downstream
    * step is the existing trained IVF-PQ machinery. The oracle replays
    * assignment + probe + encode + LUT + ADC from the staged rotated
    * vectors + staged cells/codebook — the same one-notch-up contract
    * as [[annOpq]]. */
  /** Stage (or reuse) the coarse IVF cells in the ROTATED space — the
    * bounded hash-ordered sample rotated by the production expression,
    * k-means'd. Shared by the `OPQ,IVF,PQ` chain and its residual
    * twin so both probe the SAME cells (the stagedIvfCells/
    * stagedResidualCb relationship, rotated). */
  private def stagedOpqIvfCells(s: SparkSession, dir: String,
      r: Array[Array[Float]]): String = {
    val cellStage = Staging.pathFor(dir, "opq_ivf_cells_v1", "embeddings.parquet")
    Staging.publishOnce(cellStage) { tmp =>
      val train = embs(s, dir).orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(math.max(IvfPqCells * 64, 4096))
        .select(col("vec_id"),
          graft.functions.Similarity.rotateVec(col("embedding"), r).as("remb"))
      val cents = graft.functions.Similarity.kmeansCentroids(
        train, "vec_id", "remb", IvfPqCells, iters = 2)
      import s.implicits._
      cents.map { case (id, v) => (id, v.map(_.toFloat)) }
        .toDF("cell_id", "cell_vec")
        .write.mode("overwrite").parquet(tmp)
    }
    cellStage
  }

  private def loadCells(s: SparkSession, cellStage: String): Seq[(Long, Array[Float])] =
    s.read.parquet(cellStage).orderBy("cell_id").collect()
      .map(row => row.getLong(0) -> row.getSeq[Float](1).toArray).toSeq

  def annOpqIvf(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val stage = stagedOpq(s, dir)
    opqStage = stage
    val r = loadFloatRows(s, s"$stage/rotation", "ridx", "rrow")
    val cb = loadFloatRows(s, s"$stage/codebook", "aidx", "aemb")
    val cellStage = stagedOpqIvfCells(s, dir, r)
    opqIvfCellStage = Some(cellStage)
    val cells = loadCells(s, cellStage)
    val rot = graft.functions.Similarity.rotateVec(col("embedding"), r)
    val corpus = e.select(col("vec_id"), rot.as("remb"))
    val q = e.filter(col("vec_id") < AdcQ).select(col("vec_id"), rot.as("remb"))
    graft.functions.Similarity.ivfPqTopK(
        q, "vec_id", "remb", corpus, "vec_id", "remb",
        k = AdcK, nCells = IvfPqCells, nProbe = IvfPqProbe,
        m = PqM, subDim = PqSubDim,
        coarse = Some(cells), codebook = Some(cb))
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  @volatile private var opqIvfCellStage: Option[String] = None

  /** [[annIvfPqTrainedSql]]'s chain over the staged ROTATED vectors +
    * OPQ cells/codebook. A def: stages resolve at dump time, after the
    * query run pinned them (the ivfpq_trained sentinel discipline). */
  def annOpqIvfSql: String = opqIvfCellStage match {
    case Some(cellStage) => ivfPqTrainedSqlFrom(cellStage,
      s"$opqStage/codebook",
      s"(SELECT vec_id, remb AS embedding FROM '$opqStage/rotated/*.parquet')")
    case None =>
      "SELECT * FROM graft_error_opq_ivf_stage_not_pinned_run_query_first"
  }

  /** Stage (or reuse) the residual codebook in the ROTATED space:
    * [[graft.functions.Similarity.trainResidualPqCodebooks]] over the
    * bounded hash-ordered sample rotated by the production expression,
    * against the rotated-space coarse cells — so the composed chain
    * differs from [[annOpqIvf]] in exactly the two places residual
    * encoding touches, and from [[annIvfPqResidual]] only by the
    * rotation in front. */
  private def stagedOpqResidualCb(s: SparkSession, dir: String,
      r: Array[Array[Float]], cells: Seq[(Long, Array[Float])]): String = {
    val stage = Staging.pathFor(dir, "opq_ivfpq_res_cb_v1", "embeddings.parquet")
    Staging.publishOnce(stage) { tmp =>
      val train = embs(s, dir)
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
        .select(col("vec_id"),
          graft.functions.Similarity.rotateVec(col("embedding"), r).as("remb"))
      val cb = graft.functions.Similarity.trainResidualPqCodebooks(
        train, "vec_id", "remb", cells, PqM, PqSubDim, PqC, iters = 2)
      import s.implicits._
      cb.zipWithIndex.map { case (a, j) => (j.toLong, a.toSeq) }
        .toSeq.toDF("aidx", "aemb")
        .write.mode("overwrite").parquet(tmp)
    }
    stage
  }

  /** The full FAISS index-factory chain — `OPQ,IVF,PQ` with residual
    * encoding (`OPQ64,IVF256,PQ8` in FAISS factory terms, toy-sized):
    * the trained rotation in front, coarse cells k-means'd in the
    * rotated space, and codes/LUTs quantizing the ROTATED residual
    * x·R − centroid(cell(x·R)). Rotation is orthogonal, so residual
    * geometry is preserved exactly and every downstream step is the
    * existing residual machinery unchanged — the corpus is encoded
    * once into a cell-partitioned residual code index and the query
    * batch probes it. Oracle: [[ivfPqResidualSqlFrom]] over the staged
    * rotated vectors + rotated cells/codebook — the [[annOpq]]
    * one-notch-up contract (hash match proves the IN-FLIGHT rotation
    * is bit-identical to the staging pass's floats, and every
    * assign/residual/encode/LUT/ADC step bit-identical downstream). */
  def annOpqIvfPqResidual(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val stage = stagedOpq(s, dir)
    opqStage = stage
    val r = loadFloatRows(s, s"$stage/rotation", "ridx", "rrow")
    val cellStage = stagedOpqIvfCells(s, dir, r)
    val cells = loadCells(s, cellStage)
    val cbStage = stagedOpqResidualCb(s, dir, r, cells)
    val cb = loadFloatRows(s, cbStage, "aidx", "aemb")
    val rot = graft.functions.Similarity.rotateVec(col("embedding"), r)
    val corpus = e.select(col("vec_id"), rot.as("remb"))
    val idxStage = Staging.pathFor(dir, "opq_ivfpq_res_index_v1", "embeddings.parquet")
    Staging.publishOnce(idxStage) { tmp =>
      graft.functions.Similarity.ivfPqResidualBuildIndex(
          corpus, "vec_id", "remb", cells, cb, PqM, PqSubDim)
        .write.partitionBy("cell").mode("overwrite").parquet(tmp)
    }
    opqResidStages = Some((cellStage, cbStage))
    val q = e.filter(col("vec_id") < AdcQ).select(col("vec_id"), rot.as("remb"))
    graft.functions.Similarity.ivfPqResidualSearchIndex(
        s.read.parquet(idxStage), q, "vec_id", "remb",
        cells, cb, k = AdcK, nProbe = IvfPqProbe, m = PqM, subDim = PqSubDim)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  @volatile private var opqResidStages: Option[(String, String)] = None

  /** [[ivfPqResidualSqlFrom]] over the staged ROTATED vectors + the
    * rotated-space cells/residual codebook. Sentinel until the query
    * run pins the stages. */
  def annOpqIvfPqResidualSql: String = opqResidStages match {
    case Some((cellStage, cbStage)) => ivfPqResidualSqlFrom(cellStage, cbStage,
      s"(SELECT vec_id, remb AS embedding FROM '$opqStage/rotated/*.parquet')")
    case None =>
      "SELECT * FROM graft_error_opq_ivfpq_residual_stage_not_pinned_run_query_first"
  }

  /** [[annPqSqlFrom]] over the staged trained codebook: identical
    * scoring SQL, anchors read from the artifact instead of derived. */
  def annPqTrainedSql: String =
    annPqSqlFrom(s"SELECT aidx, aemb FROM '$pqTrainedStage/*.parquet'")

  /** The oracle rebuilds codes exactly as [[pqEncodeSql]], computes the
    * same per-(query, subvector, anchor) LUT with the identical
    * ascending-d left-associative fold, pivots the m per-subvector LUT
    * hits into columns, and sums them left-to-right — so every ADC
    * double is bit-identical and (adc, neighbor_id) ranks agree. */
  val annPqSql: String = annPqSqlFrom(
    s"""SELECT aemb, ROW_NUMBER() OVER (ORDER BY avid) - 1 AS aidx
       |  FROM (SELECT vec_id AS avid, embedding AS aemb
       |        FROM embeddings ORDER BY vec_id LIMIT $PqC)""".stripMargin)

  /** The ADC replay parametrized on the anchors CTE and the vector
    * source — shared by the deterministic first-c variant, the staged
    * trained codebook, and the OPQ replay (which reads the staged
    * ROTATED vectors instead of raw embeddings). */
  private def annPqSqlFrom(anchorsCte: String,
      embSource: String = "embeddings"): String = {
    def diffSum(left: String, right: String): String =
      (1 to PqSubDim).map { d =>
        val idx = s"t.s * $PqSubDim + $d"
        s"((CAST($left[$idx] AS DOUBLE) - CAST($right[$idx] AS DOUBLE)) * " +
          s"(CAST($left[$idx] AS DOUBLE) - CAST($right[$idx] AS DOUBLE)))"
      }.mkString(" + ")
    val pivots = (0 until PqM).map(s =>
      s"MAX(CASE WHEN c.s = $s THEN l END) AS l$s").mkString(",\n         ")
    val adcSum = (0 until PqM).map(s => s"l$s").mkString(" + ")
    s"""WITH a AS (
       |  $anchorsCte),
       |cd AS (
       |  SELECT e.vec_id, t.s, a.aidx,
       |         ${diffSum("e.embedding", "a.aemb")} AS dist
       |  FROM $embSource e
       |  CROSS JOIN a, UNNEST(range(0, $PqM)) AS t(s)),
       |code AS (
       |  SELECT vec_id, s, aidx FROM (
       |    SELECT vec_id, s, aidx,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, aidx) AS rn
       |    FROM cd) WHERE rn = 1),
       |lut AS (
       |  SELECT q.vec_id AS qid, t.s, a.aidx,
       |         ${diffSum("q.embedding", "a.aemb")} AS l
       |  FROM $embSource q
       |  CROSS JOIN a, UNNEST(range(0, $PqM)) AS t(s)
       |  WHERE q.vec_id < $AdcQ),
       |piv AS (
       |  SELECT l.qid, c.vec_id,
       |         $pivots
       |  FROM code c JOIN lut l ON l.s = c.s AND l.aidx = c.aidx
       |  GROUP BY l.qid, c.vec_id),
       |ranked AS (
       |  SELECT qid AS query_id, vec_id AS neighbor_id, $adcSum AS adc,
       |         ROW_NUMBER() OVER (PARTITION BY qid
       |                            ORDER BY $adcSum ASC, vec_id ASC) AS rank
       |  FROM piv WHERE qid <> vec_id)
       |SELECT query_id, neighbor_id, round(adc, 6) AS adc, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= $AdcK ORDER BY query_id, rank""".stripMargin
  }

  // ---- feature-hashing text embedding --------------------------------

  private val HashDim = 16

  /** Hashing-trick embedding of every document: 16 signed integer
    * buckets from token md5s — exact cross-engine (integer counts, no
    * FP). Composes with [[graft.functions.Similarity]] cosine / ANN
    * when no learned encoder exists. */
  def hashEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF, VectorSketch}
    val d = Tables.read(s, dir, "documents")
      .withColumn("__w", TF.words(col("text")))
      // token-less docs have no embedding: the fold would emit an
      // all-zero row while the token-exploding oracle omits the doc —
      // the same symmetric guard hybridSearch carries (review r6)
      .filter(size(col("__w")) > 0)
      .withColumn("__hv", VectorSketch.hashingVector(col("__w"), HashDim))
    d.select(col("doc_id") +:
        (0 until HashDim).map(i => element_at(col("__hv"), i + 1).as(s"h$i")): _*)
      .orderBy("doc_id")
  }

  val hashEmbeddingSql: String = {
    val sums = (0 until HashDim).map(i =>
      s"CAST(SUM(CASE WHEN bucket = $i THEN sgn ELSE 0 END) AS BIGINT) AS h$i")
      .mkString(",\n       ")
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(w), 1, 4))::BIGINT % $HashDim AS bucket,
       |         CASE WHEN ('0x' || substr(md5(w), 5, 1))::BIGINT % 2 = 0
       |              THEN 1 ELSE -1 END AS sgn
       |  FROM tok)
       |SELECT doc_id,
       |       $sums
       |FROM hashed GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- IVF-PQ (coarse cells + asymmetric distance) -------------------

  private val IvfPqCells = 16
  private val IvfPqProbe = 4

  /** The full memory-bound ANN stack: coarse cells prune to
    * nProbe/nCells of the corpus, ADC scores the survivors from m int
    * codes. First-16 deterministic anchors serve as both coarse
    * centroids and PQ codebook so the oracle replays everything. */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.ivfPqTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = AdcK, nCells = IvfPqCells, nProbe = IvfPqProbe,
        m = PqM, subDim = PqSubDim)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Shared untrained-IVF-PQ oracle CTE chain, ending at `ranked`
    * (per-query ADC-ranked candidates, unbounded rank). Tail-appended
    * by [[annIvfPqSql]] (ADC top-k) and [[annIvfPqRerankSql]] (exact
    * refine over the top-R) so the two oracles replay ONE candidate
    * pipeline. */
  private val ivfPqRankedCtes: String = {
    def diffSum(left: String, right: String): String =
      (1 to PqSubDim).map { d =>
        val idx = s"t.s * $PqSubDim + $d"
        s"((CAST($left[$idx] AS DOUBLE) - CAST($right[$idx] AS DOUBLE)) * " +
          s"(CAST($left[$idx] AS DOUBLE) - CAST($right[$idx] AS DOUBLE)))"
      }.mkString(" + ")
    def cosSql(l: String, r: String): String =
      s"list_dot_product($l, $r) / (sqrt(list_dot_product($l, $l)) * sqrt(list_dot_product($r, $r)))"
    val pivots = (0 until PqM).map(s =>
      s"MAX(CASE WHEN c.s = $s THEN l END) AS l$s").mkString(",\n         ")
    val adcSum = (0 until PqM).map(s => s"l$s").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM embeddings),
       |a AS (
       |  SELECT avid, aemb, av, ROW_NUMBER() OVER (ORDER BY avid) - 1 AS aidx
       |  FROM (SELECT vec_id AS avid, embedding AS aemb, embedding::DOUBLE[] AS av
       |        FROM embeddings ORDER BY vec_id LIMIT $IvfPqCells)),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, a.avid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${cosSql("e.v", "a.av")} DESC, a.avid ASC) AS rn
       |    FROM e CROSS JOIN a) WHERE rn = 1),
       |cd AS (
       |  SELECT e.vec_id, t.s, a.aidx,
       |         ${diffSum("e.embedding", "a.aemb")} AS dist
       |  FROM embeddings e CROSS JOIN a, UNNEST(range(0, $PqM)) AS t(s)),
       |code AS (
       |  SELECT vec_id, s, aidx FROM (
       |    SELECT vec_id, s, aidx,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, aidx) AS rn
       |    FROM cd) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, embedding, embedding::DOUBLE[] AS qv
       |      FROM embeddings WHERE vec_id < $AdcQ),
       |probed AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.qid, a.avid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |                              ORDER BY ${cosSql("q.qv", "a.av")} DESC, a.avid ASC) AS rn
       |    FROM q CROSS JOIN a) WHERE rn <= $IvfPqProbe),
       |lut AS (
       |  SELECT q.qid, t.s, a.aidx,
       |         ${diffSum("q.embedding", "a.aemb")} AS l
       |  FROM q CROSS JOIN a, UNNEST(range(0, $PqM)) AS t(s)),
       |cand AS (
       |  SELECT p.qid, s2.vec_id
       |  FROM probed p JOIN assigned s2 ON s2.cell = p.cell
       |  WHERE p.qid <> s2.vec_id),
       |piv AS (
       |  SELECT l.qid, c.vec_id,
       |         $pivots
       |  FROM code c
       |  JOIN lut l ON l.s = c.s AND l.aidx = c.aidx
       |  JOIN cand ON cand.vec_id = c.vec_id AND cand.qid = l.qid
       |  GROUP BY l.qid, c.vec_id),
       |ranked AS (
       |  SELECT qid AS query_id, vec_id AS neighbor_id, $adcSum AS adc,
       |         ROW_NUMBER() OVER (PARTITION BY qid
       |                            ORDER BY $adcSum ASC, vec_id ASC) AS rank
       |  FROM piv)""".stripMargin
  }

  val annIvfPqSql: String =
    s"""$ivfPqRankedCtes
       |SELECT query_id, neighbor_id, round(adc, 6) AS adc, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= $AdcK ORDER BY query_id, rank""".stripMargin

  // ---- IVF-PQ + exact re-rank (the FAISS refine stage) ---------------

  private val RerankR = 15

  /** [[annIvfPq]]'s candidate pipeline widened to top-R (R=15), then
    * ONLY those candidates re-scored EXACTLY against the full float
    * vectors and cut to the final top-k by exact squared L2
    * ([[Similarity.ivfPqRerankTopK]] — candidates broadcast, corpus
    * fetched by one hash join, never shuffled). Exact distance =
    * dot(q,q) − 2·dot(q,e) + dot(e,e) with the shared ascending
    * double fold, so the oracle replays it bit-identically; recall
    * floor vs the unrefined path pinned in PipelineSpec. */
  def annIvfPqRerank(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.ivfPqRerankTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = AdcK, rerankR = RerankR, nCells = IvfPqCells, nProbe = IvfPqProbe,
        m = PqM, subDim = PqSubDim)
      .select(col("query_id"), col("neighbor_id"),
        round(col("l2"), 6).as("l2"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  val annIvfPqRerankSql: String =
    s"""$ivfPqRankedCtes,
       |cand_r AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $RerankR),
       |refine AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         list_dot_product(q.qv, q.qv)
       |           - 2 * list_dot_product(q.qv, e2.v)
       |           + list_dot_product(e2.v, e2.v) AS l2
       |  FROM cand_r c
       |  JOIN q ON q.qid = c.query_id
       |  JOIN e e2 ON e2.vec_id = c.neighbor_id),
       |fin AS (
       |  SELECT query_id, neighbor_id, l2,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY l2 ASC, neighbor_id ASC) AS rn
       |  FROM refine)
       |SELECT query_id, neighbor_id, round(l2, 6) AS l2, CAST(rn AS INTEGER) AS rank
       |FROM fin WHERE rn <= $AdcK ORDER BY query_id, rank""".stripMargin

  /** IVF-PQ with TRAINED artifacts end to end — k-means coarse cells
    * ([[Similarity.kmeansCentroids]], 2 Lloyd iterations) AND trained
    * per-subquantizer codebooks (the [[annPqTrained]] artifact, shared)
    * — the full production quality path through the same
    * literal/distributed scoring machinery (ivfPqTopK's coarse/codebook
    * swap points). Both artifacts are tiny (nCells·dim and c·dim
    * floats), staged as parquet, and READ BACK for scoring, so engine
    * and oracle work from byte-identical floats (distributed averaging
    * is ulp-sensitive to partition layout); the oracle replays coarse
    * assignment, probing, encode, LUT, and ADC from the staged values
    * with the identical fold and tie-breaks. Cell ids are the
    * kmeansCentroids 0..nCells-1 synthetic ids; probe and assignment
    * ties go to the smaller cell id on both sides. */
  /** Stage (or reuse) the trained coarse-cell artifact for `dir` and
    * return its path — shared by [[annIvfPqTrained]] and
    * [[annIvfPqPersisted]]. */
  private def stagedIvfCells(s: SparkSession, dir: String): String = {
    val e = embs(s, dir)
    val cellStage = Staging.pathFor(dir, "ivf_cells_v1", "embeddings.parquet")
    Staging.publishOnce(cellStage) { tmp =>
      // same bounded hash-ordered training sample ivfBuildIndex
      // defaults to — k-means over the whole corpus would add
      // iters full-corpus shuffles per index build at 100 TB
      val train = e.orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(math.max(IvfPqCells * 64, 4096))
      val cents = graft.functions.Similarity.kmeansCentroids(
        train, "vec_id", "embedding", IvfPqCells, iters = 2)
      import s.implicits._
      cents.map { case (id, v) => (id, v.map(_.toFloat)) }
        .toDF("cell_id", "cell_vec")
        .write.mode("overwrite").parquet(tmp)
    }
    cellStage
  }

  /** Read the trained artifacts back from their stages (byte-identical
    * floats for engine AND oracle) and pin the oracle's stage vars. */
  private def trainedArtifacts(s: SparkSession, dir: String)
      : (Seq[(Long, Array[Float])], Array[Array[Float]]) = {
    val cellStage = stagedIvfCells(s, dir)
    val cbStage = stagedPqCodebook(s, dir)
    val cells: Seq[(Long, Array[Float])] = s.read.parquet(cellStage)
      .orderBy("cell_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
    val cb: Array[Array[Float]] = s.read.parquet(cbStage)
      .orderBy("aidx").select("aemb").collect()
      .map(_.getSeq[Float](0).toArray)
    ivfTrainedCellStage = Some(cellStage)
    ivfTrainedCbStage = Some(cbStage)
    (cells, cb)
  }

  def annIvfPqTrained(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val (cells, cb) = trainedArtifacts(s, dir)
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.ivfPqTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = AdcK, nCells = IvfPqCells, nProbe = IvfPqProbe,
        m = PqM, subDim = PqSubDim,
        coarse = Some(cells), codebook = Some(cb))
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** The PERSISTED trained IVF-PQ lifecycle (r12): the same trained
    * artifacts as [[annIvfPqTrained]], but the corpus is ENCODED ONCE
    * into a cell-partitioned code table
    * ([[graft.functions.Similarity.ivfPqBuildIndex]], staged like the
    * other trained artifacts) and the query batch probes THAT —
    * [[graft.functions.Similarity.ivfPqSearchIndex]] reads only the
    * probed cells' partitions and never touches the corpus floats.
    * Scores are bit-identical to the in-plan trained path (parity also
    * pinned in PipelineSpec), so this SHARES [[annIvfPqTrainedSql]]:
    * the oracle replays encode from the same staged floats. */
  def annIvfPqPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val (cells, cb) = trainedArtifacts(s, dir)
    val idxStage = Staging.pathFor(dir, "ivfpq_index_v1", "embeddings.parquet")
    Staging.publishOnce(idxStage) { tmp =>
      graft.functions.Similarity.ivfPqBuildIndex(
          e, "vec_id", "embedding", cells, cb, PqM, PqSubDim)
        .write.partitionBy("cell").mode("overwrite").parquet(tmp)
    }
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.ivfPqSearchIndex(
        s.read.parquet(idxStage), q, "vec_id", "embedding",
        cells, cb, k = AdcK, nProbe = IvfPqProbe, m = PqM, subDim = PqSubDim)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  // None until a trained query pins them to ITS dataset's stages: a
  // hardcoded default (pre-r12) let an oracle dump that preceded the
  // query run silently read another dataset's — or a nonexistent —
  // stage instead of failing loudly (ADVICE r11)
  @volatile private var ivfTrainedCellStage: Option[String] = None
  @volatile private var ivfTrainedCbStage: Option[String] = None

  /** [[annIvfPqSql]]'s replay with the cells and codebook CTEs read
    * from the staged trained artifacts instead of derived from the
    * first-nCells corpus rows — coarse assignment/probing against
    * `cells` (cosine DESC, cell_id ASC), encode/LUT/ADC against `cb`,
    * identical folds. A def: stage paths resolve at dump time, after
    * the query run pinned them to its dataset. */
  def annIvfPqTrainedSql: String = {
    // Dump-before-run is a caller bug, not a silent cross-dataset read
    // (pre-r12 a hardcoded sf0.01 default made it exactly that). A
    // SENTINEL, not a throw: oracle maps evaluate their values when the
    // map is BUILT (e.g. Bench assembling the headline subset), which
    // can legitimately happen before this query runs — the sentinel
    // only detonates if something actually EXECUTES the unpinned
    // oracle, and then loudly (DuckDB: relation does not exist).
    val (cellStage, cbStage) = (ivfTrainedCellStage, ivfTrainedCbStage) match {
      case (Some(cell), Some(cb)) => (cell, cb)
      case _ => return "SELECT * FROM graft_error_ivfpq_trained_stage_not_pinned_run_query_first"
    }
    ivfPqTrainedSqlFrom(cellStage, cbStage)
  }

  /** The trained IVF-PQ replay parameterized on the staged cells /
    * codebook AND the vector source — shared by the trained/persisted
    * variants (raw embeddings) and the OPQ composition (the staged
    * ROTATED vectors, same contract as [[annOpqSql]]). */
  private def ivfPqTrainedSqlFrom(cellStage: String, cbStage: String,
      embSource: String = "embeddings"): String = {
    def diffSum(left: String, right: String): String =
      (1 to PqSubDim).map { d =>
        val idx = s"t.s * $PqSubDim + $d"
        s"((CAST($left[$idx] AS DOUBLE) - CAST($right[$idx] AS DOUBLE)) * " +
          s"(CAST($left[$idx] AS DOUBLE) - CAST($right[$idx] AS DOUBLE)))"
      }.mkString(" + ")
    def cosSql(l: String, r: String): String =
      s"list_dot_product($l, $r) / (sqrt(list_dot_product($l, $l)) * sqrt(list_dot_product($r, $r)))"
    val pivots = (0 until PqM).map(s =>
      s"MAX(CASE WHEN c.s = $s THEN l END) AS l$s").mkString(",\n         ")
    val adcSum = (0 until PqM).map(s => s"l$s").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM $embSource __e),
       |cells AS (
       |  SELECT cell_id, cell_vec::DOUBLE[] AS cv
       |  FROM '$cellStage/*.parquet'),
       |cb AS (SELECT aidx, aemb FROM '$cbStage/*.parquet'),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, cells.cell_id AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${cosSql("e.v", "cells.cv")} DESC,
       |                                       cells.cell_id ASC) AS rn
       |    FROM e CROSS JOIN cells) WHERE rn = 1),
       |cd AS (
       |  SELECT e.vec_id, t.s, cb.aidx,
       |         ${diffSum("e.embedding", "cb.aemb")} AS dist
       |  FROM $embSource e CROSS JOIN cb, UNNEST(range(0, $PqM)) AS t(s)),
       |code AS (
       |  SELECT vec_id, s, aidx FROM (
       |    SELECT vec_id, s, aidx,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, aidx) AS rn
       |    FROM cd) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, embedding, embedding::DOUBLE[] AS qv
       |      FROM $embSource __q WHERE vec_id < $AdcQ),
       |probed AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.qid, cells.cell_id AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |                              ORDER BY ${cosSql("q.qv", "cells.cv")} DESC,
       |                                       cells.cell_id ASC) AS rn
       |    FROM q CROSS JOIN cells) WHERE rn <= $IvfPqProbe),
       |lut AS (
       |  SELECT q.qid, t.s, cb.aidx,
       |         ${diffSum("q.embedding", "cb.aemb")} AS l
       |  FROM q CROSS JOIN cb, UNNEST(range(0, $PqM)) AS t(s)),
       |cand AS (
       |  SELECT p.qid, s2.vec_id
       |  FROM probed p JOIN assigned s2 ON s2.cell = p.cell
       |  WHERE p.qid <> s2.vec_id),
       |piv AS (
       |  SELECT l.qid, c.vec_id,
       |         $pivots
       |  FROM code c
       |  JOIN lut l ON l.s = c.s AND l.aidx = c.aidx
       |  JOIN cand ON cand.vec_id = c.vec_id AND cand.qid = l.qid
       |  GROUP BY l.qid, c.vec_id),
       |ranked AS (
       |  SELECT qid AS query_id, vec_id AS neighbor_id, $adcSum AS adc,
       |         ROW_NUMBER() OVER (PARTITION BY qid
       |                            ORDER BY $adcSum ASC, vec_id ASC) AS rank
       |  FROM piv)
       |SELECT query_id, neighbor_id, round(adc, 6) AS adc, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= $AdcK ORDER BY query_id, rank""".stripMargin
  }

  // ---- SQ8 compressed-corpus rerank (VERDICT r15 #7 optional) --------

  /** Two-stage SQ8 search: stage 1 ranks against the int8-quantized
    * corpus (the q_embedding_quantize codec — the 4×-compressed scan),
    * stage 2 exact-reranks the top-3k candidates on full floats. The
    * oracle replays both stages: quantize/dequantize are exact or
    * correctly-rounded IEEE steps, so the candidate SET matches
    * bit-for-bit, and the final ranking is the brute-force contract
    * (raw cosine desc, id asc). */
  def annSq8Rerank(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.sq8RerankTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = AdcK, rerankR = AdcK * 3)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  val annSq8RerankSql: String =
    s"""WITH z AS (
       |  SELECT vec_id, embedding,
       |         greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
       |                  1e-12) / 127.0 AS scale
       |  FROM embeddings),
       |dq AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x ->
       |           CAST(least(greatest(round(CAST(x AS DOUBLE) / scale, 0), -127.0), 127.0)
       |                AS INT) * scale) AS dv
       |  FROM z),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       |      FROM embeddings WHERE vec_id < $AdcQ),
       |s1 AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT q.qid, dq.vec_id,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |             ORDER BY list_dot_product(q.qv, dq.dv)
       |                      / (sqrt(list_dot_product(q.qv, q.qv))
       |                         * sqrt(list_dot_product(dq.dv, dq.dv))) DESC,
       |                      dq.vec_id ASC) AS rn
       |    FROM q CROSS JOIN dq WHERE q.qid <> dq.vec_id)
       |  WHERE rn <= ${AdcK * 3}),
       |e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |exact AS (
       |  SELECT s1.qid AS query_id, s1.vec_id AS neighbor_id,
       |         list_dot_product(q.qv, e2.v)
       |         / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e2.v, e2.v))) AS cos
       |  FROM s1 JOIN q ON q.qid = s1.qid JOIN e2 ON e2.vec_id = s1.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM exact)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= $AdcK ORDER BY query_id, rank""".stripMargin

  // ---- residual IVF-PQ (VERDICT r15 #4) ------------------------------

  /** Stage (or reuse) the RESIDUAL-trained PQ codebook for `dir`:
    * [[graft.functions.Similarity.trainResidualPqCodebooks]] on the
    * same bounded hash-ordered sample as the other trainers, against
    * the same staged coarse cells the trained chain probes — so the
    * residual chain differs from q_ann_ivfpq_trained in EXACTLY the
    * two places residual encoding touches (codebook trained on
    * residuals; codes/LUTs over residuals), nothing else. */
  private def stagedResidualCb(s: SparkSession, dir: String): String = {
    val cellStage = stagedIvfCells(s, dir)
    val stage = Staging.pathFor(dir, "ivfpq_res_cb_v1", "embeddings.parquet")
    Staging.publishOnce(stage) { tmp =>
      val cells: Seq[(Long, Array[Float])] = s.read.parquet(cellStage)
        .orderBy("cell_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
      val train = embs(s, dir)
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
      val cb = graft.functions.Similarity.trainResidualPqCodebooks(
        train, "vec_id", "embedding", cells, PqM, PqSubDim, PqC, iters = 2)
      import s.implicits._
      cb.zipWithIndex.map { case (a, j) => (j.toLong, a.toSeq) }
        .toSeq.toDF("aidx", "aemb")
        .write.mode("overwrite").parquet(tmp)
    }
    stage
  }

  /** Residual IVF-PQ — the FAISS IVFPQ encoding proper: codes quantize
    * x − centroid(cell(x)) against a residual-trained codebook, and
    * each (query, probed cell) pair scores through its own LUT over
    * q − centroid(cell). Same trained coarse cells, same staged-bytes
    * oracle-replay discipline as the trained chain; the corpus is
    * encoded ONCE into a cell-partitioned residual code index
    * ([[graft.functions.Similarity.ivfPqResidualBuildIndex]]) and the
    * query batch probes that. */
  /** Stage (or reuse) the residual code index for `dir` and pin the
    * oracle's stage sentinel — the shared front half of the residual
    * probe and its refine variant. Returns (index df, cells, cb). */
  private def residualIndexFor(s: SparkSession, dir: String)
      : (DataFrame, Seq[(Long, Array[Float])], Array[Array[Float]]) = {
    val cellStage = stagedIvfCells(s, dir)
    val cbStage = stagedResidualCb(s, dir)
    val cells = loadCells(s, cellStage)
    val cb = loadFloatRows(s, cbStage, "aidx", "aemb")
    val idxStage = Staging.pathFor(dir, "ivfpq_res_index_v1", "embeddings.parquet")
    Staging.publishOnce(idxStage) { tmp =>
      graft.functions.Similarity.ivfPqResidualBuildIndex(
          embs(s, dir), "vec_id", "embedding", cells, cb, PqM, PqSubDim)
        .write.partitionBy("cell").mode("overwrite").parquet(tmp)
    }
    residStages = Some((cellStage, cbStage))
    (s.read.parquet(idxStage), cells, cb)
  }

  def annIvfPqResidual(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val (idx, cells, cb) = residualIndexFor(s, dir)
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.ivfPqResidualSearchIndex(
        idx, q, "vec_id", "embedding",
        cells, cb, k = AdcK, nProbe = IvfPqProbe, m = PqM, subDim = PqSubDim)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Residual index + exact refine — the FAISS production serving
    * shape (IVFPQ-with-residuals behind IndexRefineFlat): the staged
    * residual probe widened to top-R, then ONLY those |Q|·R rows
    * exact-rescored against the full float vectors and cut to the
    * final top-k by exact squared L2
    * ([[graft.functions.Similarity.ivfPqResidualRerankTopK]]). Oracle:
    * the residual ranked chain with [[annIvfPqRerankSql]]'s refine
    * tail — identical exact-distance SQL, candidates swapped. */
  def annIvfPqResidualRerank(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val (idx, cells, cb) = residualIndexFor(s, dir)
    val q = e.filter(col("vec_id") < AdcQ)
    graft.functions.Similarity.ivfPqResidualRerankTopK(
        idx, q, "vec_id", "embedding", e, "vec_id", "embedding",
        cells, cb, k = AdcK, rerankR = RerankR, nProbe = IvfPqProbe,
        m = PqM, subDim = PqSubDim)
      .select(col("query_id"), col("neighbor_id"),
        round(col("l2"), 6).as("l2"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  @volatile private var residStages: Option[(String, String)] = None

  /** The residual replay: identical skeleton to [[annIvfPqTrainedSql]]
    * with the two residual differences spelled out — corpus codes and
    * per-(query, cell) LUTs are squared-L2 against RESIDUAL lists
    * (double subtraction of float-representable values: correctly
    * rounded, so Spark / the driver twin / DuckDB agree bit-for-bit),
    * and the LUT join carries the probed CELL (each probed cell has
    * its own LUT). Same sentinel-until-pinned contract. */
  def annIvfPqResidualSql: String = residStages match {
    case Some((cellStage, cbStage)) =>
      ivfPqResidualSqlFrom(cellStage, cbStage)
    case None =>
      "SELECT * FROM graft_error_ivfpq_residual_stage_not_pinned_run_query_first"
  }

  def annIvfPqResidualRerankSql: String = residStages match {
    case Some((cellStage, cbStage)) =>
      ivfPqResidualRerankSqlFrom(cellStage, cbStage)
    case None =>
      "SELECT * FROM graft_error_ivfpq_residual_stage_not_pinned_run_query_first"
  }

  /** [[annIvfPqResidualSql]]'s chain parameterized on the staged
    * cells / codebook AND the vector source — shared by the raw
    * residual chain (`embeddings`), the OPQ∘residual composition
    * (the staged ROTATED vectors, the [[annOpqSql]] contract), and
    * the residual-refine variant (adc ranked chain + exact tail). */
  private def ivfPqResidualSqlFrom(cellStage: String, cbStage: String,
      embSource: String = "embeddings"): String =
    s"""${ivfPqResidualRankedCtes(cellStage, cbStage, embSource)}
       |SELECT query_id, neighbor_id, round(adc, 6) AS adc, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= $AdcK ORDER BY query_id, rank""".stripMargin

  /** The residual ranked chain + [[annIvfPqRerankSql]]'s exact-refine
    * tail (same exact-distance SQL over the chain's own `q`/`e` CTEs,
    * candidates = the residual ADC top-R). */
  private def ivfPqResidualRerankSqlFrom(cellStage: String, cbStage: String,
      embSource: String = "embeddings"): String =
    s"""${ivfPqResidualRankedCtes(cellStage, cbStage, embSource)},
       |cand_r AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $RerankR),
       |refine AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         list_dot_product(q.qv, q.qv)
       |           - 2 * list_dot_product(q.qv, e2.v)
       |           + list_dot_product(e2.v, e2.v) AS l2
       |  FROM cand_r c
       |  JOIN q ON q.qid = c.query_id
       |  JOIN e e2 ON e2.vec_id = c.neighbor_id),
       |fin AS (
       |  SELECT query_id, neighbor_id, l2,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY l2 ASC, neighbor_id ASC) AS rn
       |  FROM refine)
       |SELECT query_id, neighbor_id, round(l2, 6) AS l2, CAST(rn AS INTEGER) AS rank
       |FROM fin WHERE rn <= $AdcK ORDER BY query_id, rank""".stripMargin

  private def ivfPqResidualRankedCtes(cellStage: String, cbStage: String,
      embSource: String): String = {
      def residList(vecExpr: String, cvExpr: String): String =
        s"list_transform(range(1, ${Dim + 1}), i -> $vecExpr[i] - $cvExpr[i])"
      def diffSumResid(r: String): String =
        (1 to PqSubDim).map { d =>
          val idx = s"t.s * $PqSubDim + $d"
          s"(($r[$idx] - CAST(cb.aemb[$idx] AS DOUBLE)) * " +
            s"($r[$idx] - CAST(cb.aemb[$idx] AS DOUBLE)))"
        }.mkString(" + ")
      def cosSql(l: String, r: String): String =
        s"list_dot_product($l, $r) / (sqrt(list_dot_product($l, $l)) * sqrt(list_dot_product($r, $r)))"
      val pivots = (0 until PqM).map(s =>
        s"MAX(CASE WHEN c.s = $s THEN l END) AS l$s").mkString(",\n         ")
      val adcSum = (0 until PqM).map(s => s"l$s").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embSource),
         |cells AS (
         |  SELECT cell_id, cell_vec::DOUBLE[] AS cv
         |  FROM '$cellStage/*.parquet'),
         |cb AS (SELECT aidx, aemb FROM '$cbStage/*.parquet'),
         |assigned AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cells.cell_id AS cell,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                              ORDER BY ${cosSql("e.v", "cells.cv")} DESC,
         |                                       cells.cell_id ASC) AS rn
         |    FROM e CROSS JOIN cells) WHERE rn = 1),
         |resid AS (
         |  SELECT a.vec_id, a.cell, ${residList("e.v", "c2.cv")} AS r
         |  FROM assigned a
         |  JOIN e ON e.vec_id = a.vec_id
         |  JOIN cells c2 ON c2.cell_id = a.cell),
         |cd AS (
         |  SELECT resid.vec_id, t.s, cb.aidx,
         |         ${diffSumResid("resid.r")} AS dist
         |  FROM resid CROSS JOIN cb, UNNEST(range(0, $PqM)) AS t(s)),
         |code AS (
         |  SELECT vec_id, s, aidx FROM (
         |    SELECT vec_id, s, aidx,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, aidx) AS rn
         |    FROM cd) WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |      FROM $embSource WHERE vec_id < $AdcQ),
         |probed AS (
         |  SELECT qid, cell FROM (
         |    SELECT q.qid, cells.cell_id AS cell,
         |           ROW_NUMBER() OVER (PARTITION BY q.qid
         |                              ORDER BY ${cosSql("q.qv", "cells.cv")} DESC,
         |                                       cells.cell_id ASC) AS rn
         |    FROM q CROSS JOIN cells) WHERE rn <= $IvfPqProbe),
         |qresid AS (
         |  SELECT p.qid, p.cell, ${residList("q.qv", "c2.cv")} AS r
         |  FROM probed p
         |  JOIN q ON q.qid = p.qid
         |  JOIN cells c2 ON c2.cell_id = p.cell),
         |lut AS (
         |  SELECT qresid.qid, qresid.cell, t.s, cb.aidx,
         |         ${diffSumResid("qresid.r")} AS l
         |  FROM qresid CROSS JOIN cb, UNNEST(range(0, $PqM)) AS t(s)),
         |cand AS (
         |  SELECT p.qid, p.cell, s2.vec_id
         |  FROM probed p JOIN assigned s2 ON s2.cell = p.cell
         |  WHERE p.qid <> s2.vec_id),
         |piv AS (
         |  SELECT l.qid, c.vec_id,
         |         $pivots
         |  FROM code c
         |  JOIN cand ON cand.vec_id = c.vec_id
         |  JOIN lut l ON l.s = c.s AND l.aidx = c.aidx
         |            AND l.qid = cand.qid AND l.cell = cand.cell
         |  GROUP BY l.qid, c.vec_id),
         |ranked AS (
         |  SELECT qid AS query_id, vec_id AS neighbor_id, $adcSum AS adc,
         |         ROW_NUMBER() OVER (PARTITION BY qid
         |                            ORDER BY $adcSum ASC, vec_id ASC) AS rank
         |  FROM piv)""".stripMargin
  }

  // ---- per-label centroids (mean pooling) ----------------------------

  /** Elementwise mean embedding per label — the domain/class centroid
    * (cluster profiling, classifier prototypes, k-means init).
    * posexplode → one (label, dim) hash aggregation: map-side
    * combinable, output = labels × dims regardless of corpus size.
    * Determinism: the aggIncremental contract — divide the ROUNDED sum
    * (bit-identical across aggregation orders at this magnitude) so
    * the quotient is computed from identical doubles on both engines. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    embs(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"),
        round(sum(col("v").cast("double")), 6).as("__s"))
      .select(col("label"), col("pos"), col("n"),
        round(col("__s") / col("n"), 6).as("centroid"))
      .orderBy("label", "pos")

  val labelCentroidsSql: String =
    """SELECT label, pos, COUNT(*) AS n,
      |       round(round(SUM(CAST(v AS DOUBLE)), 6) / COUNT(*), 6) AS centroid
      |FROM (SELECT label,
      |             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
      |             unnest(embedding) AS v
      |      FROM embeddings)
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  // ---- margin-based parallel-pair mining ------------------------------

  private val MarginK = 4
  private val MarginCandK = 8
  private val MarginThresh = 1.02

  /** Margin (ratio) mining between the even- and odd-id halves of the
    * embeddings table standing in for two corpora to align (bitext
    * mining / cross-modality pairing — Artetxe & Schwenk 2019): each
    * even vector's best odd-side candidate by hubness-normalized
    * margin, kept when margin >= 1.02. The oracle replays the same
    * candidate pool (top-8 by raw cosine), the same round(Σ,9)/count
    * neighborhood averages, and the same (margin desc, dst asc)
    * best-pair ranking ([[graft.functions.Similarity.marginMineTopPairs]]). */
  def marginMining(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    // both mining sides are DERIVED (filtered halves of the corpus):
    // hand the PRE-derivation frame to the broadcast gate so the
    // max-of-both estimate can never undershoot corpus-scale actuals
    // (ADVICE r13 — the gateInput plumbing gets its production caller)
    graft.functions.Similarity.marginMineTopPairs(
        e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        k = MarginK, candK = MarginCandK, threshold = MarginThresh,
        aGateInput = Some(e), bGateInput = Some(e))
      .orderBy("src_id")
  }

  val marginMiningSql: String = {
    def cosSql(l: String, r: String): String =
      s"list_dot_product($l, $r) / (sqrt(list_dot_product($l, $l)) * sqrt(list_dot_product($r, $r)))"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |a AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
       |b AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 1),
       |sab AS (
       |  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
       |         ${cosSql("a.v", "b.v")} AS cos
       |  FROM a CROSS JOIN b),
       |rab AS (
       |  SELECT src_id, dst_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY src_id
       |                            ORDER BY cos DESC, dst_id ASC) AS rn
       |  FROM sab),
       |rba AS (
       |  SELECT src_id, dst_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY dst_id
       |                            ORDER BY cos DESC, src_id ASC) AS rn
       |  FROM sab),
       |avga AS (SELECT src_id, round(sum(cos), 9) / count(*) AS avg_a
       |         FROM rab WHERE rn <= $MarginK GROUP BY src_id),
       |avgb AS (SELECT dst_id, round(sum(cos), 9) / count(*) AS avg_b
       |         FROM rba WHERE rn <= $MarginK GROUP BY dst_id),
       |m AS (
       |  SELECT r.src_id, r.dst_id, r.cos,
       |         round(r.cos / ((avga.avg_a + avgb.avg_b) / 2), 6) AS margin
       |  FROM rab r JOIN avga USING (src_id) JOIN avgb USING (dst_id)
       |  WHERE r.rn <= $MarginCandK),
       |best AS (
       |  SELECT src_id, dst_id, cos, margin,
       |         ROW_NUMBER() OVER (PARTITION BY src_id
       |                            ORDER BY margin DESC, dst_id ASC) AS rn
       |  FROM m)
       |SELECT src_id, dst_id, round(cos, 6) AS cos, margin
       |FROM best WHERE rn = 1 AND margin >= $MarginThresh
       |ORDER BY src_id""".stripMargin
  }

  // ---- kNN label-noise detection -------------------------------------

  private val NoiseK = 8
  private val NoiseThresh = 0.25

  /** Confident-learning-style label-noise screen (the kNN variant of
    * Northcutt et al. 2021): each vector's fraction of its 8 nearest
    * neighbors (by cosine, self excluded) that share its label; a
    * fraction under 0.25 flags the row as probably mislabeled — the
    * triage list a labeling pipeline re-audits. Neighbor sets ride the
    * skew-safe two-level top-k; the label joins touch k-bounded rows.
    * Fraction is count over the actual neighbor count — exact rational, no FP contract
    * needed. */
  def labelNoise(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val knn = graft.functions.Similarity.bruteForceTopK(
      e, "vec_id", "embedding", e, "vec_id", "embedding", NoiseK)
    // fraction over the ACTUAL neighbor count (a corpus smaller than
    // k+1 yields fewer neighbors; dividing by the constant k would
    // deflate same_frac and flag honest rows)
    noiseAgg(knn, e)
  }

  /** Same-label fraction over a kNN candidate frame — shared by the
    * brute-force and IVF label-noise variants. */
  private def noiseAgg(knn: DataFrame, e: DataFrame): DataFrame =
    knn
      .join(e.select(col("vec_id").as("neighbor_id"), col("label").as("n_label")),
        "neighbor_id")
      .join(e.select(col("vec_id").as("query_id"), col("label")), "query_id")
      .groupBy(col("query_id").as("vec_id"), col("label"))
      .agg(sum(when(col("n_label") === col("label"), 1L).otherwise(0L)).as("n_same"),
        count(lit(1)).as("n_nb"))
      .select(col("vec_id"), col("label"), col("n_same"),
        (col("n_same").cast("double") / col("n_nb")).as("same_frac"),
        (col("n_same").cast("double") / col("n_nb") < NoiseThresh).cast("int").as("suspect"))
      .orderBy("vec_id")

  /** [[labelNoise]] on the IVF candidate path — the corpus-scale
    * default (VERDICT r8 #4): every vector kNN-probes only its nProbe
    * nearest cells instead of the full corpus, cutting the scored
    * pairs from N² to ~N²·nProbe/nCells with the index built once.
    * The query side IS the corpus, so the probe frame shuffles on the
    * cell key rather than broadcasting (see
    * [[Similarity.ivfSearchIndex]] broadcastProbes). The oracle
    * restates the same deterministic IVF (anchors = first 16 ids,
    * kmeansIters = 0) and the same-label aggregation over its
    * candidates, so approximation and all, the result is value-gated. */
  def labelNoiseIvf(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val (anchors, assigned) = graft.functions.Similarity.ivfBuildIndex(
      e, "vec_id", "embedding", nCells = 16, kmeansIters = 0)
    val knn = graft.functions.Similarity.ivfSearchIndex(
      e, "vec_id", "embedding", anchors, assigned, "vec_id", "embedding",
      k = NoiseK, nProbe = 4, broadcastProbes = false)
    noiseAgg(knn, e)
  }

  /** DuckDB replay: the annIvf probe restated for ALL queries, then
    * the labelNoise aggregation over the probed top-k. */
  val labelNoiseIvfSql: String = {
    def cosSql(l: String, r: String): String =
      s"list_dot_product($l, $r) / (sqrt(list_dot_product($l, $l)) * sqrt(list_dot_product($r, $r)))"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |anchors AS (  -- first 16 BY ORDER, as the JVM side takes them: 'vec_id < 16'
      |  -- would silently diverge on 1-based or gapped id spaces
      |  SELECT vec_id AS cell_id, v AS cv FROM e ORDER BY vec_id LIMIT 16),
       |assign_scored AS (
       |  SELECT e.vec_id, e.v, e.label, a.cell_id, ${cosSql("e.v", "a.cv")} AS c
       |  FROM e CROSS JOIN anchors a),
       |assigned AS (
       |  SELECT vec_id, v, label, cell_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                                 ORDER BY c DESC, cell_id ASC) AS rn
       |    FROM assign_scored) WHERE rn = 1),
       |probed AS (
       |  SELECT vec_id AS qid, v AS qv, label AS qlabel, cell_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                                 ORDER BY c DESC, cell_id ASC) AS rn
       |    FROM assign_scored) WHERE rn <= 4),
       |scored AS (
       |  SELECT p.qid AS query_id, p.qlabel AS label, s.label AS n_label,
       |         ${cosSql("p.qv", "s.v")} AS cos, s.vec_id AS neighbor_id
       |  FROM probed p JOIN assigned s ON s.cell = p.cell AND s.vec_id <> p.qid),
       |ranked AS (
       |  SELECT query_id, label, n_label,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rn
       |  FROM scored),
       |agg AS (
       |  SELECT query_id AS vec_id, label,
       |         sum(CASE WHEN n_label = label THEN 1 ELSE 0 END) AS n_same,
       |         count(*) AS n_nb
       |  FROM ranked WHERE rn <= $NoiseK GROUP BY query_id, label)
       |SELECT vec_id, label, CAST(n_same AS BIGINT) AS n_same,
       |       CAST(n_same AS DOUBLE) / n_nb AS same_frac,
       |       CASE WHEN CAST(n_same AS DOUBLE) / n_nb < $NoiseThresh
       |            THEN 1 ELSE 0 END AS suspect
       |FROM agg ORDER BY vec_id""".stripMargin
  }

  val labelNoiseSql: String = {
    def cosSql(l: String, r: String): String =
      s"list_dot_product($l, $r) / (sqrt(list_dot_product($l, $l)) * sqrt(list_dot_product($r, $r)))"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
       |         c.label AS n_label, ${cosSql("q.v", "c.v")} AS cos
       |  FROM e q CROSS JOIN e c WHERE q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, label, n_label,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id ASC) AS rn
       |  FROM scored),
       |agg AS (
       |  SELECT query_id AS vec_id, label,
       |         sum(CASE WHEN n_label = label THEN 1 ELSE 0 END) AS n_same,
       |         count(*) AS n_nb
       |  FROM ranked WHERE rn <= $NoiseK GROUP BY query_id, label)
       |SELECT vec_id, label, CAST(n_same AS BIGINT) AS n_same,
       |       CAST(n_same AS DOUBLE) / n_nb AS same_frac,
       |       CASE WHEN CAST(n_same AS DOUBLE) / n_nb < $NoiseThresh
       |            THEN 1 ELSE 0 END AS suspect
       |FROM agg ORDER BY vec_id""".stripMargin
  }

  // ---- class-balance undersampling -----------------------------------

  /** Deterministic class rebalancing: every label undersampled to the
    * MINORITY class size, rows chosen by a salted-md5 priority (the
    * [[graft.functions.Dedup.mixtureSample]] hash idiom — cross-engine
    * replayable, stable under reruns). The per-label rank window is
    * bounded by the class count, and classes are few by construction —
    * a skewed-cardinality variant would ride [[graft.functions.Quota]]'s
    * bounded heap instead. */
  def classBalance(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val minN = e.groupBy("label").agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__min_n"))
    val h = substring(md5(concat(lit("bal:"), col("vec_id").cast("string")).cast("binary")), 1, 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(col("__h").asc, col("vec_id").asc)
    e.select(col("vec_id"), col("label")).withColumn("__h", h)
      .withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(minN))
      .filter(col("__rn") <= col("__min_n"))
      .select(col("vec_id"), col("label"))
      .orderBy("vec_id")
  }

  val classBalanceSql: String =
    """WITH m AS (
      |  SELECT min(n) AS min_n FROM (
      |    SELECT label, count(*) AS n FROM embeddings GROUP BY label)),
      |r AS (
      |  SELECT vec_id, label,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY label
      |           ORDER BY substr(md5('bal:' || CAST(vec_id AS VARCHAR)), 1, 8) ASC,
      |                    vec_id ASC) AS rn
      |  FROM embeddings)
      |SELECT vec_id, label FROM r CROSS JOIN m
      |WHERE rn <= min_n ORDER BY vec_id""".stripMargin

  // ---- simplified silhouette per label -------------------------------

  /** Cluster-coherence audit: the centroid-based silhouette of every
    * label over the embeddings table ([[graft.functions.Cluster
    * .simplifiedSilhouette]] — a = own-centroid distance, b = nearest
    * other centroid, s = (b−a)/max(a,b), averaged per label). One
    * corpus scan against collected class-grain centroid literals; the
    * per-label mean sums integer micros, so only the final division
    * touches doubles. */
  def silhouette(s: SparkSession, dir: String): DataFrame =
    graft.functions.Cluster.simplifiedSilhouette(embs(s, dir), "embedding", "label")

  /** The oracle recomputes the same rounded-sum centroids, the same
    * d² = x·x − 2·x·c + c·c via `list_dot_product` (ascending fold =
    * the [[graft.functions.DotProduct]] order), and the same
    * micros-scaled integer mean. */
  val silhouetteSql: String =
    """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
      |                  embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (
      |  SELECT label, pos, round(round(SUM(v), 6) / COUNT(v), 6) AS c
      |  FROM (SELECT label, CAST(generate_subscripts(v, 1) AS INT) AS pos,
      |               unnest(v) AS v
      |        FROM e)
      |  GROUP BY label, pos),
      |cl AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label),
      |d AS (
      |  SELECT e.vec_id, e.label, cl.label AS clabel,
      |         list_dot_product(e.v, e.v)
      |           - 2.0 * list_dot_product(e.v, cl.cv)
      |           + list_dot_product(cl.cv, cl.cv) AS d2
      |  FROM e CROSS JOIN cl),
      |ab AS (
      |  SELECT vec_id, label,
      |         sqrt(greatest(MAX(CASE WHEN clabel = label THEN d2 END), 0)) AS a,
      |         sqrt(greatest(MIN(CASE WHEN clabel <> label THEN d2 END), 0)) AS b
      |  FROM d GROUP BY vec_id, label),
      |s AS (
      |  SELECT label,
      |         CAST(round(
      |           (CASE WHEN greatest(a, b) > 0
      |                 THEN (b - a) / greatest(a, b) ELSE 0 END) * 1000000.0)
      |           AS BIGINT) AS m
      |  FROM ab)
      |SELECT label, COUNT(*) AS n,
      |       round(CAST(SUM(m) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6)
      |         AS mean_silhouette
      |FROM s GROUP BY label ORDER BY label""".stripMargin

  // ---- per-dimension standardization (whitening) -----------------------

  /** Embedding preprocessing: standardize every dimension to zero mean
    * / unit variance over the corpus (the diagonal "whitening" step
    * before PCA/ANN training that stops high-variance dims from
    * dominating L2 distances). posexplode → one (dim) hash aggregation
    * — 64 rows of stats at any corpus size — broadcast back onto the
    * scan; the normalized values are a narrow projection. Determinism:
    * mean/sd derive from exact BIGINT sums of 1e6-scaled values via one
    * fixed formula ([[graft.queries.HistoryQueries.zscoreNorm]]'s
    * contract, per dimension; decimal(38) swap documented for corpora
    * where Σ(scaled²) nears the BIGINT range). */
  def whitenDims(s: SparkSession, dir: String): DataFrame =
    VectorSketch.standardizeDims(embs(s, dir), "vec_id", "embedding")
      .orderBy("vec_id", "pos")

  val whitenDimsSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |sc AS (SELECT vec_id, pos, v, CAST(round(v * 1000000.0) AS BIGINT) AS sv FROM e),
      |st AS (SELECT pos, COUNT(*) AS n, CAST(SUM(sv) AS BIGINT) AS m,
      |              CAST(SUM(sv * sv) AS BIGINT) AS q
      |       FROM sc GROUP BY pos),
      |f AS (SELECT pos,
      |             CAST(m AS DOUBLE) / n / 1000000.0 AS mean,
      |             sqrt(CAST(q AS DOUBLE) / n / 1000000000000.0
      |                  - (CAST(m AS DOUBLE) / n / 1000000.0)
      |                    * (CAST(m AS DOUBLE) / n / 1000000.0)) AS sd
      |      FROM st)
      |SELECT e.vec_id, e.pos,
      |       CASE WHEN f.sd > 0 THEN round((e.v - f.mean) / f.sd, 6) END AS z
      |FROM e JOIN f USING (pos) ORDER BY vec_id, pos""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_silhouette" -> (silhouette _),
    "q_whiten_dims" -> (whitenDims _),
    "q_label_noise" -> (labelNoise _),
    "q_label_noise_ivf" -> (labelNoiseIvf _),
    "q_class_balance" -> (classBalance _),
    "q_margin_mining" -> (marginMining _),
    "q_label_centroids" -> (labelCentroids _),
    "q_ann_ivfpq" -> (annIvfPq _),
    "q_ann_ivfpq_rerank" -> (annIvfPqRerank _),
    "q_ann_ivfpq_trained" -> (annIvfPqTrained _),
    "q_ann_ivfpq_persisted" -> (annIvfPqPersisted _),
    "q_ann_ivfpq_residual" -> (annIvfPqResidual _),
    "q_ann_ivfpq_residual_rerank" -> (annIvfPqResidualRerank _),
    "q_ann_opq_ivfpq_residual" -> (annOpqIvfPqResidual _),
    "q_ann_sq8_rerank" -> (annSq8Rerank _),
    "q_random_projection" -> (randomProjection _),
    "q_pq_encode" -> (pqEncode _),
    "q_ann_pq" -> (annPq _),
    "q_ann_pq_trained" -> (annPqTrained _),
    "q_ann_opq" -> (annOpq _),
    "q_ann_opq_ivf" -> (annOpqIvf _),
    "q_hash_embedding" -> (hashEmbedding _))

  // a def: annPqTrainedSql resolves its stage path at dump time (set by
  // the query run in this JVM), same contract as PipelineQueries.oracles
  def oracles: Map[String, String] = Map(
    "q_silhouette" -> silhouetteSql,
    "q_whiten_dims" -> whitenDimsSql,
    "q_label_noise" -> labelNoiseSql,
    "q_label_noise_ivf" -> labelNoiseIvfSql,
    "q_class_balance" -> classBalanceSql,
    "q_margin_mining" -> marginMiningSql,
    "q_label_centroids" -> labelCentroidsSql,
    "q_random_projection" -> randomProjectionSql,
    "q_pq_encode" -> pqEncodeSql,
    "q_ann_pq" -> annPqSql,
    "q_ann_pq_trained" -> annPqTrainedSql,
    "q_ann_opq" -> annOpqSql,
    "q_ann_opq_ivf" -> annOpqIvfSql,
    "q_ann_ivfpq" -> annIvfPqSql,
    "q_ann_ivfpq_rerank" -> annIvfPqRerankSql,
    "q_ann_ivfpq_trained" -> annIvfPqTrainedSql,
    "q_ann_ivfpq_persisted" -> annIvfPqTrainedSql,
    "q_ann_ivfpq_residual" -> annIvfPqResidualSql,
    "q_ann_ivfpq_residual_rerank" -> annIvfPqResidualRerankSql,
    "q_ann_opq_ivfpq_residual" -> annOpqIvfPqResidualSql,
    "q_ann_sq8_rerank" -> annSq8RerankSql,
    "q_hash_embedding" -> hashEmbeddingSql)
}
