package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over derived edge sets — the structural metrics a
  * curation pipeline computes on its near-dup / co-occurrence graphs
  * (beyond [[Dedup.connectedComponents]]'s labeling): triangle
  * counting and the degree profile. The gate's graph is user
  * co-activity (two users active in the same minute), whose DISTINCT
  * edge set is bounded by the user-pair space regardless of event
  * volume.
  *
  * Scale notes: triangle counting is the canonical two-join shape —
  * `e ⋈ e ⋈ e` with every edge stored once in canonical `(a < b)`
  * orientation, so each triangle is counted exactly once (a<b<c) and
  * both joins are keyed equi-joins (no enumeration of wedges beyond
  * the hash join's probe). Degree-skewed graphs are the known hard
  * case: the first join's fanout is Σ deg(v)² — production systems
  * split high-degree vertices first (same salting discipline as
  * [[graft.ops.SkewJoin]]); the rehearsal-scale fixture here keeps
  * the point at the plan shape.
  */
object GraphOps {

  /** Canonical (a < b) distinct co-activity edges. */
  def coActivityEdges(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(date_trunc("minute", col("ts")).as("m"), col("user_id"))
      .distinct()
    act.select(col("m"), col("user_id").as("a"))
      .join(act.select(col("m"), col("user_id").as("b")), Seq("m"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Triangle count of a canonical (a < b) edge set — 1-row frame. */
  def triangleCount(e: DataFrame): DataFrame =
    e.select(col("a").as("t_a"), col("b").as("t_b"))
      .join(e.select(col("a").as("u_a"), col("b").as("u_b")),
        col("u_a") === col("t_b"))
      .join(e.select(col("a").as("v_a"), col("b").as("v_b")),
        col("v_a") === col("t_a") && col("v_b") === col("u_b"))
      .agg(count(lit(1)).as("n_triangles"))

  /** One-row structural profile: nodes, edges, triangles, max/avg
    * degree (degree over the undirected edge set).
    */
  def triangleProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = coActivityEdges(spark, dir)
    val tri = triangleCount(e)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .agg(count(lit(1)).as("n_nodes"), max(col("d")).as("max_degree"),
        sum(col("d")).as("deg_sum"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    deg.crossJoin(edges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("max_degree"),
        round(col("deg_sum").cast("double") / col("n_nodes").cast("double"), 4)
          .as("avg_degree"))
  }

  /** PageRank in EXACT integer fixed point (micro-units: 1.0 ≡ 1e6):
    * `r' = 0.15 + 0.85·Σ r(u)/deg(u)` becomes
    * `150000 + (850000·Σ(r(u) div deg(u))) div 1e6` — every operation
    * is integer, so the iteration is bit-deterministic across
    * partitionings AND engines: the classic float formulation sums
    * contributions in shuffle order and can never hash-match an
    * oracle; this one can and does (the DuckDB twin unrolls the same
    * iterations as CTEs). The div-truncation bias is bounded by
    * 1 micro-unit per in-edge per round — invisible at ranking grain
    * and identical in both engines.
    *
    * Dataflow per round: one (src-keyed) join of the 16-byte rank
    * frame with edges, one dst-keyed contribution aggregate — the
    * same two-shuffle round as [[Dedup.connectedComponents]], with
    * `localCheckpoint` truncating lineage so plans stay flat at any
    * iteration count.
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int = 5): DataFrame = {
    val directed = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val deg = directed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = directed.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var rank = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = directed
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("rank div deg").as("share"))
        .groupBy(col("node")).agg(sum(col("share")).as("c"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(850000 * coalesce(c, bigint(0))) div 1000000"))
            .as("rank"))
        .localCheckpoint(true)
    }
    rank.orderBy(col("rank").desc, col("node")).limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_triangles" -> (triangleProfile _),
    "graph_pagerank" -> ((s, d) =>
      pageRankFixedPoint(coActivityEdges(s, d), iters = 5))
  )

  /** The PageRank oracle unrolls the SAME integer fixed-point
    * iterations as chained CTEs (generated, one per round) — possible
    * only because the arithmetic is exact integers; `//` in DuckDB
    * and `div` in Spark both truncate, and inputs are non-negative.
    */
  private def pageRankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST(150000 + (850000 * coalesce(s.c, 0)) // 1000000
         |              AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank // d.deg) AS c
         |    FROM e JOIN r${i - 1} r ON r.node = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY 1) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH act AS (
       |  SELECT DISTINCT date_trunc('minute', ts) AS m, user_id FROM events),
       |ue AS (
       |  SELECT DISTINCT x.user_id AS a, y.user_id AS b
       |  FROM act x JOIN act y ON x.m = y.m AND x.user_id < y.user_id),
       |e AS (SELECT a AS src, b AS dst FROM ue
       |      UNION ALL SELECT b, a FROM ue),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT node, rank FROM r$iters
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pageRankOracle(5),
    "graph_triangles" ->
      """WITH act AS (
        |  SELECT DISTINCT date_trunc('minute', ts) AS m, user_id FROM events),
        |e AS (
        |  SELECT DISTINCT x.user_id AS a, y.user_id AS b
        |  FROM act x JOIN act y ON x.m = y.m AND x.user_id < y.user_id),
        |deg AS (
        |  SELECT v, count(*) AS d FROM (
        |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |  GROUP BY 1)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |       (SELECT count(*) FROM e) AS n_edges,
        |       (SELECT count(*) FROM e e1
        |        JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles,
        |       (SELECT max(d) FROM deg) AS max_degree,
        |       (SELECT round(CAST(sum(d) AS DOUBLE)
        |                     / CAST(count(*) AS DOUBLE), 4)
        |        FROM deg) AS avg_degree""".stripMargin
  )
}
