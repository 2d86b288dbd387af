package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Public library facade for graph analytics over ARBITRARY caller
  * edge DataFrames, delegating to the same code path as the
  * oracle-checked `gr_pagerank` query.
  */
object Graphs {

  /** Damped PageRank (d = 0.85) of a DIRECTED edge frame: `iters`
    * fixed integer-exact rounds, ranks in millionths of the initial
    * mass (every node starts at 1,000,000). Returns (node, rank).
    * For an undirected graph, pass each edge in both directions. The
    * edge list hash-partitions on src once and is reused by every
    * iteration's join — only vertex-scale rank tables move per round.
    */
  def pagerank(edges: DataFrame, iters: Int = 3,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    graft.operators.Graph.pagerankOf(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")), iters)
      .select(col("node"), col("r").as("rank"))
}
