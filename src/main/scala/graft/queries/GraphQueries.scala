package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Graph, Privacy}
import graft.sources.Tables

/** Link-graph and privacy-audit queries: PageRank domain authority over
  * a deterministically planted domain link graph, and the
  * k-anonymity/l-diversity audit + suppression pass a structured-data
  * release runs before shipping (the structured-column counterpart of
  * the PII text scrub).
  */
object GraphQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  // ---- PageRank domain authority -------------------------------------

  private val PrIters = 3
  private val PrDamping = 0.85

  /** The corpus has no real link graph, so each doc plants two directed
    * domain edges keyed on doc_id (the url_canonical 20-domain universe):
    * src = doc_id%20 links to (7·doc_id+3)%20 and (13·doc_id+5)%20.
    * Self-loops drop, domain 19's outlinks drop — so 19 is a DANGLING
    * node and the teleport redistribution path is exercised, not just
    * written. Three power iterations, d = 0.85. The oracle unrolls the
    * identical iterations as chained CTEs with the same round-12
    * contract ([[Graph.pageRank]]), so ranks hash-match at round-6. */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = docs(s, dir)
      .select(pmod(col("doc_id"), lit(20L)).as("src"),
        explode(array(
          pmod(col("doc_id") * 7 + 3, lit(20L)),
          pmod(col("doc_id") * 13 + 5, lit(20L)))).as("dst"))
      .filter(col("src") =!= col("dst") && col("src") =!= 19L)
      .distinct()
    Graph.pageRank(edges, "src", "dst", PrIters, PrDamping)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  val pagerankSql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e0 AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT doc_id % 20 AS src, (doc_id * 7 + 3) % 20 AS dst FROM documents
      |    UNION ALL
      |    SELECT doc_id % 20, (doc_id * 13 + 5) % 20 FROM documents)
      |  WHERE src <> dst AND src <> 19),
      |nodes AS (
      |  SELECT DISTINCT node FROM (
      |    SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |od AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src),
      |r0 AS (SELECT node, round(1.0 / nn.n, 12) AS r FROM nodes CROSS JOIN nn)""".stripMargin
    for (k <- 1 to PrIters) {
      sb ++= s""",
      |d$k AS (
      |  SELECT round(coalesce(sum(r.r), 0), 12) AS dm
      |  FROM r${k - 1} r LEFT JOIN od ON r.node = od.src
      |  WHERE od.src IS NULL),
      |c$k AS (
      |  SELECT e.dst AS node, round(sum(r.r / od.deg), 12) AS c
      |  FROM e0 e JOIN od ON e.src = od.src JOIN r${k - 1} r ON r.node = e.src
      |  GROUP BY e.dst),
      |r$k AS (
      |  SELECT n.node,
      |         round((1.0 - $PrDamping) / nn.n
      |               + $PrDamping * (coalesce(c.c, 0) + d$k.dm / nn.n), 12) AS r
      |  FROM nodes n CROSS JOIN nn CROSS JOIN d$k
      |  LEFT JOIN c$k c ON c.node = n.node)""".stripMargin
    }
    sb ++= s"""
      |SELECT node, round(r, 6) AS rank FROM r$PrIters ORDER BY node""".stripMargin
    sb.result()
  }

  // ---- label-propagation communities ---------------------------------

  private val LpIters = 3

  /** Community detection over a two-cluster planted domain graph:
    * domains 0-9 and 10-19 each link only within their decade
    * (dst = (doc_id·7+3)%10 and (doc_id·13+5)%10 offset into src's
    * decade), so [[Graph.labelPropagation]]'s synchronous
    * min-tie-break sweeps must recover the two communities — and the
    * oracle unrolls the identical 3 sweeps (mode per node, ties to the
    * smallest label) as chained CTEs, pinning every intermediate
    * labeling, not just the final grouping. */
  def labelProp(s: SparkSession, dir: String): DataFrame = {
    val src = pmod(col("doc_id"), lit(20L))
    val decade = lit(10L) * floor(src / 10.0).cast("long")
    val edges = docs(s, dir)
      .select(src.as("src"),
        explode(array(
          pmod(col("doc_id") * 7 + 3, lit(10L)) + decade,
          pmod(col("doc_id") * 13 + 5, lit(10L)) + decade,
          // stride-1 and stride-2 ring chords: the doc-keyed edges
          // alone are parity-flipping (7d+3 and 13d+5 invert d's
          // parity mod 10), i.e. BIPARTITE — and synchronous LPA on a
          // bipartite graph freezes into the two parity classes
          // instead of the planted clusters. The odd cycles these
          // chords create break that.
          pmod(src + 1, lit(10L)) + decade,
          pmod(src + 2, lit(10L)) + decade)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    Graph.labelPropagation(edges, "src", "dst", LpIters)
      .orderBy("node")
  }

  val labelPropSql: String = {
    val sb = new StringBuilder
    sb ++= """WITH e0 AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT doc_id % 20 AS src,
      |           (doc_id * 7 + 3) % 10 + 10 * ((doc_id % 20) // 10) AS dst
      |    FROM documents
      |    UNION ALL
      |    SELECT doc_id % 20, (doc_id * 13 + 5) % 10 + 10 * ((doc_id % 20) // 10)
      |    FROM documents
      |    UNION ALL
      |    SELECT doc_id % 20, (doc_id % 20 + 1) % 10 + 10 * ((doc_id % 20) // 10)
      |    FROM documents
      |    UNION ALL
      |    SELECT doc_id % 20, (doc_id % 20 + 2) % 10 + 10 * ((doc_id % 20) // 10)
      |    FROM documents)
      |  WHERE src <> dst),
      |und AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)
      |  WHERE src <> dst),
      |nodes AS (SELECT DISTINCT src AS node FROM und),
      |l0 AS (SELECT node, node AS lbl FROM nodes)""".stripMargin
    for (k <- 1 to LpIters) {
      sb ++= s""",
      |m$k AS (
      |  SELECT u.dst AS node, l.lbl, count(*) AS n
      |  FROM und u JOIN l${k - 1} l ON l.node = u.src
      |  GROUP BY u.dst, l.lbl),
      |w$k AS (
      |  SELECT node, lbl FROM (
      |    SELECT node, lbl,
      |           ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, lbl ASC) AS rn
      |    FROM m$k) WHERE rn = 1),
      |l$k AS (
      |  SELECT l.node, coalesce(w.lbl, l.lbl) AS lbl
      |  FROM l${k - 1} l LEFT JOIN w$k w USING (node))""".stripMargin
    }
    sb ++= s"""
      |SELECT node, lbl AS community FROM l$LpIters ORDER BY node""".stripMargin
    sb.result()
  }

  // ---- k-anonymity / l-diversity audit -------------------------------

  private val MinK = 5
  private val MinL = 3

  /** Quasi-identifiers on the customer table: (nation, market segment,
    * 5000-wide balance band) — the released columns an attacker links
    * against outside data. Sensitive attribute: the exact account
    * balance. One row per equivalence class with its size k, sensitive
    * diversity l, and the at-risk verdict (k < 5 or l < 3). */
  def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.read(s, dir, "customer")
      .withColumn("bal_band", floor(col("c_acctbal") / 5000.0).cast("long"))
    Privacy.kAnonymityAudit(c,
        Seq("c_nationkey", "c_mktsegment", "bal_band"), "c_acctbal", MinK, MinL)
      .orderBy("c_nationkey", "c_mktsegment", "bal_band")
  }

  val kAnonymitySql: String =
    s"""WITH c AS (
       |  SELECT c_nationkey, c_mktsegment,
       |         CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS bal_band,
       |         c_acctbal
       |  FROM customer)
       |SELECT c_nationkey, c_mktsegment, bal_band,
       |       CAST(count(*) AS BIGINT) AS k,
       |       CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l,
       |       CASE WHEN count(*) < $MinK
       |              OR count(DISTINCT c_acctbal) < $MinL THEN 1 ELSE 0 END AS at_risk
       |FROM c GROUP BY c_nationkey, c_mktsegment, bal_band
       |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin

  /** The suppression transform the audit drives: records in at-risk
    * classes ship with their QI columns masked to NULL; the flag rides
    * along so the release can count its utility cost. Record-level
    * output, one row per customer. */
  def kSuppress(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.read(s, dir, "customer")
      .withColumn("bal_band", floor(col("c_acctbal") / 5000.0).cast("long"))
      .select("c_custkey", "c_nationkey", "c_mktsegment", "bal_band", "c_acctbal")
    Privacy.suppress(c,
        Seq("c_nationkey", "c_mktsegment", "bal_band"), "c_acctbal", MinK, MinL)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "bal_band", "suppressed")
      .orderBy("c_custkey")
  }

  val kSuppressSql: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey, c_mktsegment,
       |         CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS bal_band,
       |         c_acctbal
       |  FROM customer),
       |v AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band,
       |         CASE WHEN count(*) < $MinK
       |                OR count(DISTINCT c_acctbal) < $MinL THEN 1 ELSE 0 END AS at_risk
       |  FROM c GROUP BY c_nationkey, c_mktsegment, bal_band)
       |SELECT c.c_custkey,
       |       CASE WHEN v.at_risk = 1 THEN NULL ELSE c.c_nationkey END AS c_nationkey,
       |       CASE WHEN v.at_risk = 1 THEN NULL ELSE c.c_mktsegment END AS c_mktsegment,
       |       CASE WHEN v.at_risk = 1 THEN NULL ELSE c.bal_band END AS bal_band,
       |       v.at_risk AS suppressed
       |FROM c JOIN v USING (c_nationkey, c_mktsegment, bal_band)
       |ORDER BY c.c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (pagerank _),
    "q_label_prop" -> (labelProp _),
    "q_k_anonymity" -> (kAnonymity _),
    "q_k_suppress" -> (kSuppress _))

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> pagerankSql,
    "q_label_prop" -> labelPropSql,
    "q_k_anonymity" -> kAnonymitySql,
    "q_k_suppress" -> kSuppressSql)
}
