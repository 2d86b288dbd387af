package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN index maintenance — the production "index keeps up
  * with ingest" loop on top of the batch add path (operators.IvfPq
  * .indexAddOf, oracle-checked as `sim_index_add`): new vectors arrive
  * as a file stream and each micro-batch is encoded under foreachBatch
  * against the SESSION-FROZEN coarse cells and residual codebooks (the
  * Materialize index tables — built once by the first batch, read by
  * every later one: the FAISS train-once/add-forever contract), then
  * appended to the code table. Per-batch cost is |batch| × (C + M·CB)
  * broadcast distance evaluations — it scales with the batch, never
  * the corpus, exactly as the batch path pins. StreamingIndexSpec
  * twin-pins the drained stream against one batch add over the same
  * vectors, including a multi-micro-batch split.
  *
  * Delivery contract: foreachBatch is AT-LEAST-ONCE — after a
  * mid-batch failure the restarted query re-runs the same batchId. The
  * sink is made idempotent by writing each micro-batch to its OWN
  * batchId-named partition with overwrite semantics (a retry rewrites
  * the same directory instead of re-appending), so the drained code
  * table holds each encoded row exactly once; read it back through
  * [[codeTable]], which hides the layout column.
  */
object IndexIngest {

  /** Stream (vec_id, embedding) parquet files from `srcDir`, encode
    * each micro-batch against the `dir`-keyed frozen index artifacts,
    * write encoded rows to `outDir` (one overwritten batchId partition
    * per micro-batch — idempotent under foreachBatch retries). */
  def start(spark: SparkSession, dir: String, srcDir: String,
            outDir: String, ck: String,
            maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val base = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
      .filter(col("vec_id") % 10 =!= 7) // the sim_index_add base slice
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.IvfPq.indexAddOf(
            batch.select(col("vec_id"), col("embedding").as("v")),
            base,
            index = graft.sources.Materialize.indexOf(spark, dir))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The drained code table: the batchId partitions are a sink-layout
    * detail, not data — partition discovery surfaces them as a `batch`
    * column, dropped here. */
  def codeTable(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch")
}
