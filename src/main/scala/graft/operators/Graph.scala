package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics over a relationship graph derived from the
  * lake tables — PageRank on the customer↔supplier trading graph
  * (edge (c, s) iff some order of customer c contains a lineitem
  * supplied by s; undirected, so each edge contributes both
  * directions). Complements `dd_cluster`'s label propagation: that
  * finds components, this ranks nodes by stationary visit mass.
  *
  * Everything is INTEGER-exact so the oracle replays it bit-for-bit:
  * ranks live in millionths (r0 = 1,000,000 per node), per-edge
  * contribution is `rank div outdeg` (floor), and the damped update is
  * `150,000 + (85 · Σ contribs) div 100` — the standard d=0.85
  * PageRank recurrence with (1−d)·scale = 150,000. Iteration count is
  * FIXED (3): a bounded driver loop over lazy DataFrames, the same
  * shape as `Clustering`'s Lloyd rounds. Floor-division loses < 1
  * millionth per edge, irrelevant to ranking and — because both
  * engines floor identically — zero drift.
  *
  * Scale shape (the Pregel argument): per iteration, ONE shuffle join
  * of the rank table (|V| rows) against the edge list partitioned on
  * src, and one dst-keyed partial aggregation. The edge list — the
  * 100 TB side — is hash-partitioned on src ONCE and cached; every
  * iteration's join reuses that layout, so iterating never re-shuffles
  * the big side. Rank tables are |V| rows (vertex scale, not edge
  * scale). No driver-side collect anywhere: the loop composes lazy
  * plans and a single action materializes the final ranks.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  private val SCALE = 1000000L  // rank units: millionths
  private val ITERS = 3

  /** One damped update: floor per-edge contributions, aggregate by
    * dst, apply 0.85 damping in integer arithmetic. Every node keeps a
    * row (undirected graph ⇒ in-degree ≥ 1, but the left join + base
    * term is the general dangling-safe form). */
  private[graft] def step(edges: DataFrame, ranks: DataFrame): DataFrame = {
    val inflow = edges.join(ranks, col("src") === col("node"))
      .select(col("dst"), expr("r div deg").as("c"))
      .groupBy("dst").agg(sum("c").as("inflow"))
    ranks.select(col("node"))
      .join(inflow, col("node") === col("dst"), "left")
      .select(col("node"),
        (lit(150000L) + expr("(85 * coalesce(inflow, 0L)) div 100"))
          .as("r"))
  }

  /** Damped PageRank of a DIRECTED (src, dst) edge frame: attaches
    * out-degrees, hash-partitions the edge list on src once (the
    * layout every iteration's join reuses), and runs `iters` fixed
    * integer-exact rounds. Returns (node, r) with r in millionths —
    * the [[graft.api.Graphs]] facade shape. */
  private[graft] def pagerankOf(directed: DataFrame,
                                iters: Int = ITERS): DataFrame = {
    val deg = directed.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = directed.join(deg, "src")
      .repartition(col("src"))
      .cache()
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct()
    val r0 = nodes.withColumn("r", lit(SCALE))
    (1 to iters).foldLeft(r0)((r, _) => step(edges, r))
  }

  val queries: Map[String, Q] = Map(
    "gr_pagerank" -> ((s, dir) => {
      val pairs = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("cnode"),
          (col("l_suppkey") * 2 + 1).as("snode"))
        .distinct()
      val directed = pairs
        .select(col("cnode").as("src"), col("snode").as("dst"))
        .unionAll(
          pairs.select(col("snode").as("src"), col("cnode").as("dst")))
      pagerankOf(directed)
        .select(col("node"),
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("kind"),
          col("r").as("rank_millionths"))
        .orderBy("node")
    })
  )

  /** One update as a DuckDB CTE (integer floor division `//`). */
  private def stepSql(prev: String, out: String): String =
    s"""${out}_in AS (
       |  SELECT e.dst, SUM(p.r // e.deg) AS inflow
       |  FROM edges e JOIN $prev p ON e.src = p.node
       |  GROUP BY e.dst),
       |$out AS (
       |  SELECT n.node,
       |    150000 + (85 * COALESCE(i.inflow, 0)) // 100 AS r
       |  FROM nodes n LEFT JOIN ${out}_in i ON n.node = i.dst)"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    "gr_pagerank" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT o.o_custkey * 2 AS cnode,
         |    l.l_suppkey * 2 + 1 AS snode
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |directed AS (
         |  SELECT cnode AS src, snode AS dst FROM pairs
         |  UNION ALL
         |  SELECT snode AS src, cnode AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS deg FROM directed GROUP BY src),
         |edges AS (
         |  SELECT d.src, d.dst, g.deg FROM directed d
         |  JOIN deg g ON d.src = g.src),
         |nodes AS (SELECT DISTINCT src AS node FROM directed),
         |r0 AS (SELECT node, CAST($SCALE AS BIGINT) AS r FROM nodes),
         |${stepSql("r0", "r1")},
         |${stepSql("r1", "r2")},
         |${stepSql("r2", "r3")}
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  CAST(r AS BIGINT) AS rank_millionths
         |FROM r3 ORDER BY node""".stripMargin
  )
}
