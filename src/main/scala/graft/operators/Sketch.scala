package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CardSketch, FreqSketch}

/** Sketch-based approximate aggregation (SURVEY.md §2.12 notes the
  * reference has no approx-distinct): the custom [[CardSketch]]
  * TypedImperativeAggregate over order customers, grouped by status.
  * The oracle recomputes the register table in pure SQL (md5 prefix →
  * 60-bit integer → bucket/rank via generated CASE chain) — integer-
  * exact, no estimate drift in the comparison.
  */
object Sketch {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // SpaceSaving heavy hitters over the corpus token stream. Capacity
    // 64 exceeds the testdata vocabulary, so the summary is EXACT
    // (err = 0 for every entry) and pairs against plain GROUP BY
    // counts; SketchSpec exercises the approximate regime. The single
    // global summary is fine at any scale: partial aggregation runs
    // map-side and only capacity-entry summaries cross the wire.
    "fs_heavy_hitters" -> ((s, dir) => {
      FreqSketch.register(s)
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .agg(expr("freq_sketch(word, 64)").as("summary"))
        .select(explode(expr(
          "transform(split(summary, ';'), x -> struct(" +
            "split(x, ':')[0] AS word," +
            "cast(split(x, ':')[1] AS bigint) AS cnt))")).as("e"))
        .select(col("e.word"), col("e.cnt"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    "cs_card_sketch" -> ((s, dir) => {
      CardSketch.register(s)
      Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("card_sketch(cast(o_custkey as string))").as("registers"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_orderstatus")
    })
  )

  private val oracleSql: String = {
    // h60 = value of the first 15 hex digits of md5(custkey-as-string)
    val digitSum = (0 until 15).map { i =>
      val p = math.pow(16, 14 - i).toLong
      s"CAST((strpos('0123456789abcdef', substr(hx, ${i + 1}, 1)) - 1) " +
        s"AS BIGINT) * $p"
    }.mkString("\n      + ")
    // rho = leading zeros of the 54-bit tail + 1, via descending CASE
    val rhoCase = (53 to 0 by -1).map { k =>
      s"WHEN tail >= ${1L << k} THEN ${54 - k}"
    }.mkString("\n        ")
    s"""WITH hx AS (
       |  SELECT o_orderstatus,
       |         md5(CAST(o_custkey AS VARCHAR)) AS hx FROM orders),
       |h60 AS (
       |  SELECT o_orderstatus,
       |    ($digitSum) AS h60
       |  FROM hx),
       |bt AS (
       |  SELECT o_orderstatus, h60 // ${1L << 54} AS b,
       |         h60 % ${1L << 54} AS tail
       |  FROM h60),
       |rho AS (
       |  SELECT o_orderstatus, b,
       |    CASE $rhoCase
       |         ELSE 55 END AS rho
       |  FROM bt),
       |regs AS (
       |  SELECT o_orderstatus, b, max(rho) AS r
       |  FROM rho GROUP BY o_orderstatus, b),
       |statuses AS (SELECT DISTINCT o_orderstatus FROM orders),
       |grid AS (
       |  SELECT s.o_orderstatus, g.range AS b
       |  FROM statuses s, range(0, 64) g),
       |full_regs AS (
       |  SELECT grid.o_orderstatus, grid.b, coalesce(regs.r, 0) AS r
       |  FROM grid LEFT JOIN regs
       |    ON grid.o_orderstatus = regs.o_orderstatus AND grid.b = regs.b),
       |cnt AS (SELECT o_orderstatus, count(*) AS n_rows
       |        FROM orders GROUP BY o_orderstatus)
       |SELECT f.o_orderstatus,
       |       string_agg(f.r, ',' ORDER BY f.b) AS registers,
       |       any_value(cnt.n_rows) AS n_rows
       |FROM full_regs f JOIN cnt ON f.o_orderstatus = cnt.o_orderstatus
       |GROUP BY f.o_orderstatus ORDER BY f.o_orderstatus""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "cs_card_sketch" -> oracleSql,
    "fs_heavy_hitters" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word
        |      FROM documents) t
        |GROUP BY word ORDER BY cnt DESC, word""".stripMargin)
}
