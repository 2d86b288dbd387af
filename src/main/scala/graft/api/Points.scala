package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Public library facade for density clustering over ARBITRARY caller
  * (id, x, y) point DataFrames (integer coordinates), delegating to
  * the grid-bucketed path behind the oracle-checked `db_dbscan_grid`
  * query.
  */
object Points {

  /** DBSCAN labeling: (id, role, label) with role core / border /
    * noise and label = min core id of the density-connected component
    * (−1 for noise). `eps2` is the SQUARED radius; `cell` must be
    * ≥ eps so the 3×3 grid block covers the eps ball (pass eps
    * itself unless you want coarser buckets); border points attach
    * to their minimum-labeled core neighbor — the deterministic
    * variant of DBSCAN's order-dependent border rule. The
    * eps-neighborhood join is cell-keyed (never all-pairs) and core
    * components contract in O(log d) rounds. */
  def dbscan(points: DataFrame, eps2: Long, cell: Long, minPts: Int,
             idCol: String = "id", xCol: String = "x",
             yCol: String = "y"): DataFrame = {
    require(cell * cell >= eps2, s"cell $cell must be >= eps (eps2=$eps2)")
    val in = points.select(col(idCol).as("k"), col(xCol).as("x"),
      col(yCol).as("y"))
    // core-component contraction is checkpoint-backed → memoized per
    // (session, input plan) — the graft.api.Graphs serving contract
    graft.sources.Materialize.resultOnce("points.dbscan",
      s"eps2=$eps2,cell=$cell,minPts=$minPts", Seq(in))(
      graft.operators.Density.dbscan(in, eps2, cell, minPts)
        .select(col("k").as(idCol), col("role"), col("label")))
  }
}
