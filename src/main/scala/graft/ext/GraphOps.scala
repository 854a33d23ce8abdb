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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_triangles" -> (triangleProfile _)
  )

  val oracles: Map[String, String] = Map(
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
