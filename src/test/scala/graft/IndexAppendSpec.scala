package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity}
import graft.sources.VersionedTable

/** Incremental persisted-index APPEND lifecycle (VERDICT r12 next-round
  * #6): a daily-ingest deployment must add a batch's bands/codes to the
  * existing index artifact WITHOUT re-encoding the corpus. Both
  * encoders are row-local given fixed parameters/trained artifacts, so
  * the contract is exact: init(corpus) + append(batch) ≡
  * build(corpus ∪ batch) as a row SET, probe results identical, and a
  * reader pinned at the pre-append version untouched (VersionedTable
  * snapshot isolation — the atomicity/crash story the manifest claim
  * already carries).
  */
class IndexAppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(s)
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("minhash: init + append == rebuild; probes identical; pinned version isolated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_app").toString
    val docs = graft.sources.Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)

    val v1 = Dedup.minhashIndexCommit(s"$dir/idx", corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8)
    val v2 = Dedup.minhashIndexCommit(s"$dir/idx", batch, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, append = true)
    assert(v2 == v1 + 1)

    val appended = Dedup.minhashReadIndex(spark, s"$dir/idx")
    val rebuilt = Dedup.minhashBuildIndex(docs, "doc_id", "text", 3, 32, 8)
    assert(sameRows(appended, rebuilt),
      "appended band table must equal the full rebuild row-for-row")

    // a reader pinned at v1 sees exactly the pre-append corpus bands
    val pinned = Dedup.minhashReadIndex(spark, s"$dir/idx", Some(v1))
    assert(sameRows(pinned, Dedup.minhashBuildIndex(corpus, "doc_id", "text", 3, 32, 8)),
      "pinned pre-append version must be untouched by the append")

    // probe parity: a fresh batch probed through the appended artifact
    // matches the same probe through the in-memory rebuild
    val probe = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 900000L).as("b_id"), col("text"))
    def run(index: DataFrame) =
      Dedup.minhashSearchIndex(index, docs, "doc_id", "text",
          probe, "b_id", "text", shingleN = 3, k = 32, bands = 8, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(appended) == run(rebuilt) && run(appended).nonEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ivf-pq: init + append == rebuild with shared trained artifacts; probes identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_app2").toString
    val e = graft.sources.Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // tiny trained artifacts — FIXED across init/append/rebuild, as in
    // production: appending never retrains
    val train = e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(512)
    val coarse = Similarity.kmeansCentroids(train, "vec_id", "embedding", 4, iters = 1)
      .map { case (id, v) => (id, v.map(_.toFloat).toArray) }
    val cb = Similarity.trainPqCodebooks(train, "vec_id", "embedding", 8, 8, 8, iters = 1)

    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val v1 = Similarity.ivfPqIndexCommit(s"$dir/idx", corpus, "vec_id", "embedding",
      coarse, cb, m = 8, subDim = 8)
    val v2 = Similarity.ivfPqIndexCommit(s"$dir/idx", batch, "vec_id", "embedding",
      coarse, cb, m = 8, subDim = 8, append = true)
    assert(v2 == v1 + 1)

    val appended = Similarity.ivfPqReadIndex(spark, s"$dir/idx")
    val rebuilt = Similarity.ivfPqBuildIndex(e, "vec_id", "embedding", coarse, cb, 8, 8)
    assert(sameRows(appended, rebuilt),
      "appended code table must equal the full rebuild row-for-row")

    val q = e.filter(col("vec_id") < 4)
    def run(index: DataFrame) =
      Similarity.ivfPqSearchIndex(index, q, "vec_id", "embedding",
          coarse, cb, k = 5, nProbe = 2, m = 8, subDim = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.get(3).toString)).toSet
    assert(run(appended) == run(rebuilt) && run(appended).nonEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
