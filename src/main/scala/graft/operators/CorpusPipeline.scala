package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Flagship composition: the end-to-end training-corpus cleaning
  * pipeline — quality gate → MinHash near-dup removal (keep the lowest
  * doc_id of each candidate pair) → per-language corpus statistics.
  * Chains the text-analysis and dedup operators into the single pass a
  * 100 TB data-curation job would run; every stage is the same code
  * path the individual operators use, so correctness is inherited, and
  * the composed oracle recomputes the whole chain in SQL.
  */
object CorpusPipeline {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "pipe_clean_corpus" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // stage 1: quality gate (ta_quality_score semantics: not 'poor')
      val good = docs.filter(size(split(col("text"), " ")) >= 5)
      // stage 2: near-dup removal — drop the id2 side of every MinHash
      // candidate pair with >= 6/9 signature agreement. Shares
      // Dedup.minhashPairs with dd_minhash_lsh: identical subplan ⇒
      // identical generated code (compiled once per JVM) and one
      // maintenance point for the signature/candidate stage.
      val dupIds = Dedup.minhashPairs(s, dir)
        .select(col("id2").as("doc_id")).distinct()
      val kept = good.join(dupIds, Seq("doc_id"), "left_anti")
      // stage 3: per-language corpus stats
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("lang")
    })
  )

  val oracles: Map[String, String] = Map(
    "pipe_clean_corpus" -> {
      // the dd_minhash_lsh oracle, reused as a CTE for the dup-id set
      val minhash = Dedup.oracles("dd_minhash_lsh")
      s"""WITH pairs AS ($minhash),
         |dups AS (SELECT DISTINCT id2 AS doc_id FROM pairs),
         |good AS (
         |  SELECT * FROM documents
         |  WHERE len(string_split(text, ' ')) >= 5
         |    AND doc_id NOT IN (SELECT doc_id FROM dups))
         |SELECT lang, count(*) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
         |FROM good GROUP BY lang ORDER BY lang""".stripMargin
    }
  )
}
