package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public library facade for entity resolution (record linkage) over
  * ARBITRARY caller DataFrames, delegating to the same blocking /
  * verify / consolidation path as the oracle-checked
  * `er_blocked_match` and `er_entities` queries.
  *
  * Blocking contract (part of ER semantics — recall is defined
  * relative to it): each name emits its k-prefix AND k-suffix block
  * keys, k adapting to master cardinality (k = 4 + 2·⌊log10(n/1500)⌋,
  * the size-adaptive rule whose candidate growth the ×10 soak
  * measured as exactly linear); candidates are key collisions,
  * verified with a bounded levenshtein. Names shorter than k+1 can
  * lose both keys under a length-changing edit — the documented
  * short-string gap.
  */
object Entities {

  /** Review-queue matches: (dirty_id, matched_key, dist) for every
    * dirty record within `maxDist` edits of a master name that shares
    * a block key. One row per (dirty, master) pair, dist exact. */
  def matchRecords(dirty: DataFrame, master: DataFrame,
                   dirtyIdCol: String = "id", dirtyNameCol: String = "name",
                   masterIdCol: String = "id", masterNameCol: String = "name",
                   maxDist: Int = 2): DataFrame =
    graft.operators.FuzzyJoin.blockedMatches(
      dirty.select(col(dirtyIdCol), col(dirtyNameCol)),
      master.select(col(masterIdCol), col(masterNameCol)),
      maxDist)

  /** Full resolution: consolidate pairwise matches into entities via
    * the same O(log d) star contraction the graph family uses, over
    * the bipartite match graph (dirty ids on plane 2d+1, master ids
    * on plane 2m). Only HIGH-PRECISION edges (dist ≤ `mergeDist`,
    * default 1) consolidate — transitive closure amplifies every
    * false link, so the merge threshold is stricter than the
    * review-queue `maxDist`, exactly as `er_entities` does it.
    *
    * Returns (entity_id, kind, record_id): every matched record's
    * entity assignment, kind ∈ {"dirty", "master"}. Unmatched records
    * are absent (no edge touches them). Requires NUMERIC ids on both
    * frames (the bipartite plane encoding is arithmetic). */
  def resolve(dirty: DataFrame, master: DataFrame,
              dirtyIdCol: String = "id", dirtyNameCol: String = "name",
              masterIdCol: String = "id", masterNameCol: String = "name",
              mergeDist: Int = 1): DataFrame = {
    val m = matchRecords(dirty, master, dirtyIdCol, dirtyNameCol,
      masterIdCol, masterNameCol, maxDist = mergeDist)
    val edges = m.select((col("dirty_id") * 2 + 1).as("u"),
      (col("matched_key") * 2).as("v"))
    // checkpoint-backed component resolution → memoized per (session,
    // inputs) — the graft.api.Graphs serving contract
    graft.sources.Materialize.resultOnce("entities.resolve",
      s"merge=$mergeDist", Seq(edges))(
      graft.operators.Graph.starComponents(edges)
        .select(col("cluster_id").as("entity_id"),
          when(col("node") % 2 === 1, lit("dirty"))
            .otherwise(lit("master")).as("kind"),
          expr("node div 2").as("record_id")))
  }
}
