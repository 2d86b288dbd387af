package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE-style upsert without a table format that supports MERGE INTO
  * (no Delta/Iceberg in this environment): updates win over target on
  * key match, unmatched updates insert, unmatched target rows survive.
  *
  * Implemented as union + per-key row_number preferring the update side
  * — ONE hash shuffle on the key, no full-outer join (whose
  * coalesce-every-column form reshuffles both sides and breaks under
  * schema drift). At 100 TB this is the compaction-job shape: newest
  * version wins per key.
  */
object Upsert {
  /** Both frames must share schema; `keys` identify a row. */
  def merge(target: DataFrame, updates: DataFrame,
            keys: Seq[String]): DataFrame = {
    val t = target.withColumn("_src", lit(0))
    val u = updates.withColumn("_src", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_src").desc) // update row first
    t.unionAll(u)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
  }
}
