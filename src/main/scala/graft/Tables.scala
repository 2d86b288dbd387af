package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over a scale-factor directory (see TESTDATA.md).
  *
  * Mirrors the reference's qualified-name table scans
  * (`code/curate/02_customer_sp.sql:22` `session.table(...)`) re-expressed as
  * self-describing Parquet reads — the scan is vectorized (`ColumnarBatch`)
  * and Catalyst pushes filters/projections down to the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` stores `TIMESTAMP(NANOS)`, which Spark's parquet
    * reader rejects. Read nanos as long (legacy conf) and rebuild a
    * microsecond timestamp with exact integer division (`div`, not `/` —
    * float division would lose sub-millisecond precision on epoch-nanos).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }

  /** Register the tables used by a `spark.sql` query as temp views (S9). */
  def register(spark: SparkSession, dir: String, tables: String*): Unit = {
    val ts = if (tables.isEmpty) names else tables
    ts.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
  }
}
