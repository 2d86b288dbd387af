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

  /** Raise a narrow source's parallelism to the cluster default before
    * heavy per-row compute (signature hashing, shingling, codecs): a
    * single large unsplittable input (one parquet row group, a .gz
    * text file) delivers ONE input split regardless of
    * maxPartitionBytes, serializing every downstream expression until
    * the first exchange. Round-robin repartition right after the read
    * is the standard fix (optimization guide §2.5 "input skew"; the
    * Multimodal codec paths already do this with a measured 2× win) —
    * and a source already at ≥ default parallelism returns untouched,
    * so wide production scans skip the extra exchange. Keyless
    * repartition is deterministic (sort-before-repartition) and every
    * consumer aggregates by key, so results are unaffected. Call only
    * on raw scans / narrow projections: deciding the no-op branch
    * plans the frame once. */
  def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** `events.parquet` has shipped with two physical `ts` encodings across
    * generator versions: `TIMESTAMP(NANOS)` (which Spark's parquet reader
    * rejects — read nanos as long via the legacy conf and rebuild a
    * microsecond timestamp with exact integer `div`, not float `/`) and
    * plain `timestamp[us]` (decoded as TIMESTAMP_NTZ). Branch on the decoded
    * type and normalize both to session-zone `TimestampType` — every session
    * here runs UTC, so the NTZ→TZ cast is instant-preserving and downstream
    * `unix_micros`/window arithmetic sees identical values either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Register the tables used by a `spark.sql` query as temp views (S9). */
  def register(spark: SparkSession, dir: String, tables: String*): Unit = {
    val ts = if (tables.isEmpty) names else tables
    ts.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
  }
}
