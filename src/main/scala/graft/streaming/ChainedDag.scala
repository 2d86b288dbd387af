package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Two-stage chained streaming DAG — the reference's task-DAG shape
  * (reference `code/curate/05_task_DAG.sql:3-19`: a dependency chain
  * downstream of the streaming append, TXN feed → curation → enriched
  * fact) run as TWO StreamingQueries with INDEPENDENT checkpoints:
  *
  *   stage 1: TxnFeed source → parse + curate → curated parquet table
  *   stage 2: file-STREAM over that curated table → watermarked
  *            10-second windowed totals per payment method → append
  *
  * Stage 2 reading stage 1's sink as a stream is what chains the DAG:
  * the parquet sink + file-source pair gives exactly-once BETWEEN the
  * stages (committed files only, tracked in stage 2's checkpoint), so
  * one restart replayed across BOTH checkpoints resumes each stage
  * from its own offsets with no duplicate or lost windows —
  * ChainedDagSpec pins exactly that, and the batch twin
  * (`t11_chained_dag_twin`) hash-matches a DuckDB oracle that
  * reconstructs the whole feed from range(n).
  */
object ChainedDag {

  /** transaction payload schema (price as DECIMAL so cents stay exact) */
  val txnSchema: StructType = StructType(Seq(
    StructField("txn_id", StringType),
    StructField("txn_date", StringType),
    StructField("txn_quantity", LongType),
    StructField("customer_id", StringType),
    StructField("product_id", StringType),
    StructField("product_unit_price", DecimalType(10, 2)),
    StructField("product_desc", StringType),
    StructField("payment_method", StringType)))

  /** Stage-1 curation: Kafka-shaped (key, value) → typed transaction
    * columns; money kept as exact integer CENTS (the decimal-before-
    * aggregate contract, integer-released for the oracle). */
  def curate(raw: DataFrame): DataFrame =
    raw.select(col("offset"), from_json(col("value"), txnSchema).as("t"))
      .select(col("offset"),
        col("t.txn_id"),
        to_timestamp(col("t.txn_date"), "MM/dd/yyyy HH:mm:ss.SSS")
          .as("ts"),
        col("t.txn_quantity").as("qty"),
        (col("t.product_unit_price") * 100).cast("long")
          .as("unit_cents"),
        col("t.payment_method"))
      .filter(col("qty") > 0)

  /** Stage-2 aggregate: 10-second tumbling windows per payment method.
    * `withWatermark` is a no-op in batch, so the oracle-checked twin
    * shares this exact plan definition. */
  def windowedTotals(curated: DataFrame): DataFrame =
    curated
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("payment_method"))
      .agg(count(lit(1)).as("n_txns"),
        sum("qty").as("sum_qty"),
        sum(col("unit_cents") * col("qty")).as("sum_amount_cents"))
      .select(expr("unix_micros(window.start)").as("ws_us"),
        col("payment_method"), col("n_txns"), col("sum_qty"),
        col("sum_amount_cents"))

  /** Stage 1 as a StreamingQuery: drain the feed up to `total` into the
    * curated table dir (AvailableNow — deterministic tests; production
    * would run the reference's 10 s flush trigger). */
  def startCuration(spark: SparkSession, total: Long, perBatch: Long,
                    curatedDir: String, ck: String): StreamingQuery =
    curate(spark.readStream.format("txnfeed")
        .option("total", total.toString)
        .option("msgsPerBatch", perBatch.toString)
        .load())
      .writeStream.format("parquet")
      .option("path", curatedDir)
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stage 2 as a StreamingQuery READING STAGE 1'S TABLE AS A STREAM —
    * the DAG edge. Append mode: a window emits once its end passes the
    * watermark, exactly once across restarts (state + seen-files both
    * live in this stage's own checkpoint). */
  def startWindowed(spark: SparkSession, curatedDir: String,
                    outDir: String, ck: String): StreamingQuery = {
    val curatedSchema = StructType(Seq(
      StructField("offset", LongType),
      StructField("txn_id", StringType),
      StructField("ts", TimestampType),
      StructField("qty", LongType),
      StructField("unit_cents", LongType),
      StructField("payment_method", StringType)))
    windowedTotals(spark.readStream.schema(curatedSchema)
        .parquet(curatedDir))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
