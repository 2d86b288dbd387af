package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The custom DataSourceV2 micro-batch source (graft.sources.TxnFeed):
  * cadence under admission control, checkpointed restart without
  * duplicates or gaps, and bit-level replay determinism against the
  * batch read of the same offset range.
  */
class TxnFeedSpec extends SparkSpec {

  private def fresh(name: String): (String, String) = {
    // the scratch root may have been wiped by a bench run in between
    // (Bench.resetScratch deletes it wholesale) — always re-create it
    val root = Files.createDirectories(Paths.get("/tmp/graft_scratch"))
    val base = Files.createTempDirectory(root, s"txnfeed_$name").toString
    (s"$base/out", s"$base/ck")
  }

  private def drain(total: Long, perBatch: Long, out: String,
                    ck: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = spark.readStream.format("txnfeed")
      .option("total", total.toString)
      .option("msgsPerBatch", perBatch.toString)
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not drain in time")
    q
  }

  test("kafka-shaped schema via the ServiceLoader short name") {
    val df = spark.read.format("txnfeed").option("total", "10").load()
    assert(df.schema === StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false),
      StructField("partition", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false))))
    assert(df.count() === 10)
  }

  test("micro-batch cadence: 3000 messages drain as 1000-message batches") {
    val (out, ck) = fresh("cadence")
    val q = drain(3000, 1000, out, ck)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length === 3,
      s"expected 3 micro-batches, got ${batches.map(_.numInputRows).mkString(",")}")
    assert(batches.forall(_.numInputRows === 1000))
    val got = spark.read.parquet(out)
    assert(got.count() === 3000)
    assert(got.select("offset").distinct().count() === 3000)
  }

  test("checkpoint restart resumes from the committed offset, no dups/gaps") {
    val (out, ck) = fresh("restart")
    drain(2000, 1000, out, ck)
    assert(spark.read.parquet(out).count() === 2000)
    // the feed grows (total 2000 → 5000); the restarted query must pick
    // up at offset 2000 from the checkpoint, not re-emit from 0
    drain(5000, 1000, out, ck)
    val got = spark.read.parquet(out)
    assert(got.count() === 5000)
    assert(got.select("offset").distinct().count() === 5000)
    assert(got.agg(min("offset"), max("offset")).head() ===
      org.apache.spark.sql.Row(0L, 4999L))
  }

  test("streamed rows are byte-identical to the batch read (replay determinism)") {
    val (out, ck) = fresh("twin")
    drain(1500, 500, out, ck)
    val streamed = spark.read.parquet(out)
    val batch = spark.read.format("txnfeed").option("total", "1500").load()
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("value payload carries the datagen's shape and 100 msg/s pacing") {
    val df = spark.read.format("txnfeed").option("total", "100").load()
      .withColumn("r", from_json(col("value"), StructType.fromDDL(
        "txn_id STRING, txn_date STRING, txn_quantity INT, " +
          "customer_id STRING, product_id STRING, " +
          "product_unit_price DOUBLE, payment_method STRING")))
    val rows = df.select("offset", "key", "r.*", "timestamp").collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      assert(r.getAs[String]("key") === r.getAs[Long]("offset").toString)
      assert(r.getAs[String]("txn_id").matches("[A-Z][0-9]{11}"))
      val q = r.getAs[Int]("txn_quantity"); assert(q >= 1 && q <= 30)
      val p = r.getAs[Double]("product_unit_price")
      assert(p >= 1.0 && p <= 900.0)
      assert(r.getAs[String]("product_id").matches("[A-Z][1-9]-[0-9]{7}[A-Z]"))
    }
    // in-data timestamps advance 10 ms per message: 100 msg/s
    val ts = df.select(expr("unix_millis(timestamp)")).as[Long](
      spark.implicits.newLongEncoder).collect().sorted
    assert(ts.zip(ts.tail).forall { case (a, b) => b - a == 10 })
  }
}
