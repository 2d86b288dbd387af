package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-corpus preparation operators: fixed-window document
  * chunking and token-budget sequence packing — the two transforms
  * between a cleaned corpus (see CorpusPipeline) and a tokenizer
  * feeding a trainer. Both are pure narrow/codegen plans plus at most
  * one hash shuffle; neither sorts globally.
  */
object CorpusPrep {
  type Q = (SparkSession, String) => DataFrame

  /** chunk window / stride in tokens: 64-token windows every 48 tokens
    * (16-token overlap), the sliding-window shape context-limited
    * encoders use so no sentence is seen only at a window edge. */
  private[graft] val W = 64
  private[graft] val S = 48

  /** packing: greedy fill toward a fixed token budget per training
    * sequence, done independently inside 32 hash groups — the
    * distributed form of first-fit-decreasing. A global FFD needs a
    * total order over all documents (one partition at 100 TB); hash
    * groups keep every stage data-parallel and cost at most one
    * under-filled bin per group, bounded regardless of corpus size. */
  private[graft] val BUDGET = 512
  private[graft] val GROUPS = 32

  /** Overlapping token-window chunks of ANY (doc_id, text) frame.
    * nchunks = 1 + ceil((n-w)/s) so the final window may be short but
    * every token is covered; integer arithmetic only (ceil-div via
    * (x + s - 1) div s) so the oracle can't drift on float rounding.
    * Parameterized for the [[graft.api.Corpus]] facade; the named
    * query runs it with the W/S defaults. */
  private[graft] def chunkOf(docs: DataFrame, w: Int = W,
                             s: Int = S): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("ntok", size(col("toks")))
      .withColumn("chunk_id", explode(expr(
        // cast: `div` yields BIGINT, and the chunk ordinal contract
        // (and the oracle) is INT
        s"sequence(0, cast(greatest(0, (ntok - $w + $s - 1) div $s) as int))")))
      .select(
        col("doc_id"), col("chunk_id"),
        expr(s"size(slice(toks, chunk_id * $s + 1, $w))").as("n_tokens"),
        expr(s"array_join(slice(toks, chunk_id * $s + 1, $w), ' ')")
          .as("chunk_text"))
      .filter(col("n_tokens") > 0) // stride can overshoot short docs

  /** Token-budget packing of ANY (doc_id, ntok) frame: per hash group,
    * order items longest-first (FFD's sort step), running token total,
    * bin = how many full budgets precede the item. One shuffle (the
    * window partition); bins overflow the budget by at most one item's
    * tokens. */
  private[graft] def packOf(items: DataFrame, budget: Int = BUDGET,
                            groups: Int = GROUPS): DataFrame =
    items
      .withColumn("grp", expr(s"cast(doc_id % $groups as int)"))
      .withColumn("cum", sum("ntok").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("grp")
          .orderBy(col("ntok").desc, col("doc_id"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("bin", expr(s"cast((cum - ntok) div $budget as int)"))
      .groupBy("grp", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntok").as("tot_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))

  val queries: Map[String, Q] = Map(
    "doc_chunk" -> ((s, dir) =>
      chunkOf(Tables(s, dir, "documents"))
        .orderBy("doc_id", "chunk_id")),

    "pack_sequences" -> ((s, dir) =>
      packOf(Tables(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("ntok")))
        .orderBy("grp", "bin")))

  val oracles: Map[String, String] = Map(
    // unnest(range(...)) rather than a lateral generate_series —
    // DuckDB's table function can't take correlated column arguments
    "doc_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         len(string_split(text, ' ')) AS ntok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, toks, CAST(unnest(range(0,
         |      greatest(0, (ntok - $W + $S - 1) // $S) + 1)) AS INTEGER)
         |    AS chunk_id
         |  FROM t)
         |SELECT doc_id, chunk_id,
         |  CAST(len(toks[chunk_id * $S + 1 : chunk_id * $S + $W])
         |    AS INTEGER) AS n_tokens,
         |  array_to_string(toks[chunk_id * $S + 1 : chunk_id * $S + $W],
         |    ' ') AS chunk_text
         |FROM c
         |WHERE len(toks[chunk_id * $S + 1 : chunk_id * $S + $W]) > 0
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS ntok,
         |    CAST(doc_id % $GROUPS AS INTEGER) AS grp
         |  FROM documents),
         |w AS (
         |  SELECT *, SUM(ntok) OVER (
         |      PARTITION BY grp ORDER BY ntok DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT grp, CAST((cum - ntok) // $BUDGET AS INTEGER) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS tot_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM w
         |GROUP BY 1, 2
         |ORDER BY grp, bin""".stripMargin)
}
