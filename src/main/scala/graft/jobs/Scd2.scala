package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: given the union of versioned rows
  * (each carrying its effective date), close each version at the next
  * version's effective date and flag the open one — ONE window over one
  * key shuffle, no self-join. The end-of-time sentinel is a string date
  * so both engines compare it identically.
  *
  * This is the dimension-maintenance pattern the reference's
  * overwrite-only customer curation cannot express: updates preserve
  * history instead of clobbering it.
  */
object Scd2 {
  val EndOfTime = "9999-12-31"

  /** `versions`: one row per (key, version) with `fromCol` the
    * effective date (sortable string). Adds valid_to / is_current. */
  def finalizeHistory(versions: DataFrame, keys: Seq[String],
                      fromCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(fromCol))
    versions
      .withColumn("valid_to",
        coalesce(lead(col(fromCol), 1).over(w), lit(EndOfTime)))
      .withColumn("is_current", col("valid_to") === lit(EndOfTime))
  }
}

/** Data-quality gate: declarative per-row rules, one aggregate pass for
  * the per-rule violation summary, and a pass/quarantine split — the
  * expectations step a pipeline runs before promoting a bronze batch.
  */
object DataQuality {
  /** One row per rule: (rule, n_fail), plus a `rows_quarantined` row
    * counting rows failing ANY rule — all from a single aggregate. */
  def summary(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (n, c) =>
      sum(when(!c, 1).otherwise(0)).cast("long").as(n)
    } :+ sum(when(rules.map(_._2).reduce(_ && _), 0).otherwise(1))
      .cast("long").as("rows_quarantined")
    val names = rules.map(_._1) :+ "rows_quarantined"
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${names.size}, " +
        names.map(n => s"'$n', $n").mkString(", ") + ") AS (rule, n_fail)")
  }

  /** (pass, quarantine) split on the conjunction of all rules. */
  def quarantine(df: DataFrame,
                 rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val ok = rules.map(_._2).reduce(_ && _)
    (df.filter(ok), df.filter(!ok))
  }
}
