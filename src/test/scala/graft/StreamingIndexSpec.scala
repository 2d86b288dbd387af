package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Streaming ANN index maintenance (streaming/IndexIngest): the add
  * path runs under foreachBatch from a file stream, encoding every
  * micro-batch against the session-frozen codebooks and appending to
  * the index table. Twin pin: draining the stream (split across
  * multiple micro-batches) must produce EXACTLY the rows of one batch
  * `sim_index_add` over the same vectors — same frozen-codebook
  * training rule, so the oracle contract is untouched.
  */
class StreamingIndexSpec extends SparkSpec {

  test("foreachBatch index add equals the batch add, across micro-batches") {
    val root = Files.createDirectories(Paths.get("/tmp/graft_scratch"))
    val base = Files.createTempDirectory(root, "idxstream").toString
    val (src, out, ck) = (s"$base/src", s"$base/out", s"$base/ck")

    // the sim_index_add ADD slice, split into 4 files → 4 micro-batches
    Tables(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 === 7)
      .select("vec_id", "embedding")
      .repartition(4)
      .write.parquet(src)

    val q = streaming.IndexIngest.start(spark, sf, src, out, ck)
    assert(q.awaitTermination(180000), "index stream did not drain")
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected the add to span multiple micro-batches")

    val streamed = streaming.IndexIngest.codeTable(spark, out)
      .orderBy("vec_id").collect()
    val batch = operators.IvfPq.queries("sim_index_add")(spark, sf)
      .collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }

    // foreachBatch is at-least-once: a replayed micro-batch must
    // leave the code table unchanged. Rewrite one batch partition the
    // way a retry would (same batchId, overwrite) and re-compare.
    spark.read.parquet(s"$out/batch=0")
      .write.mode("overwrite").parquet(s"$base/b0_retry")
    spark.read.parquet(s"$base/b0_retry")
      .write.mode("overwrite").parquet(s"$out/batch=0")
    val replayed = streaming.IndexIngest.codeTable(spark, out)
      .orderBy("vec_id").collect()
    assert(replayed.length == batch.length,
      "a replayed micro-batch changed the code table")
    replayed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }
}
