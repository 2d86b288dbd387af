package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.streaming.ChainedDag

/** The two-stage chained streaming DAG (streaming/ChainedDag — the
  * reference's 05_task_DAG.sql dependency-chain shape): stage 1 drains
  * the TxnFeed into a curated table, stage 2 streams THAT table into
  * watermarked windowed totals. The spec's core claim is exactly-once
  * ACROSS THE CHAIN under a restart replayed across BOTH checkpoints:
  * the feed grows, both stages restart from their own offsets, and the
  * final window rows are duplicate-free and value-equal to the batch
  * twin run over the whole feed.
  */
class ChainedDagSpec extends SparkSpec {

  private def fresh(name: String): (String, String, String, String) = {
    val root = Files.createDirectories(Paths.get("/tmp/graft_scratch"))
    val base = Files.createTempDirectory(root, s"chain_$name").toString
    (s"$base/curated", s"$base/ck1", s"$base/windows", s"$base/ck2")
  }

  private def drainChain(total: Long, curated: String, ck1: String,
                         windows: String, ck2: String): Unit = {
    val q1 = ChainedDag.startCuration(spark, total, 1000, curated, ck1)
    assert(q1.awaitTermination(180000), "stage 1 did not drain")
    val q2 = ChainedDag.startWindowed(spark, curated, windows, ck2)
    assert(q2.awaitTermination(180000), "stage 2 did not drain")
  }

  test("chain is exactly-once across a restart over BOTH checkpoints") {
    val (curated, ck1, windows, ck2) = fresh("restart")

    // first run: 15000 messages (150 s of 100 msg/s feed)
    drainChain(15000, curated, ck1, windows, ck2)
    val firstWindows = spark.read.parquet(windows).count()
    assert(firstWindows > 0, "no windows emitted before restart")

    // the feed grows to 30000; BOTH stages restart from their own
    // checkpoints — stage 1 must resume at offset 15000 (no re-append),
    // stage 2 must resume its file log + window state (no re-emit)
    drainChain(30000, curated, ck1, windows, ck2)

    // stage-1 exactly-once: every offset exactly once after the restart
    val cur = spark.read.parquet(curated)
    assert(cur.count() === 30000L)
    assert(cur.select("offset").distinct().count() === 30000L)

    // stage-2 exactly-once: one row per (window, payment method) — a
    // replayed window would show up as a duplicate key
    val win = spark.read.parquet(windows)
    val n = win.count()
    assert(n > firstWindows, "restart emitted no new windows")
    assert(win.select("ws_us", "payment_method").distinct().count() === n,
      "duplicate window emissions across the restart")

    // value equality against the oracle-checked batch twin
    // (t11_chained_dag_twin runs the same plan at total=20000; here the
    // twin runs over THIS feed's 30000 messages): every emitted window
    // must carry exactly the batch-computed totals — watermarking only
    // bounds WHICH windows have emitted (the trailing ones are still in
    // stage 2's state), never their values
    val twin = ChainedDag.windowedTotals(ChainedDag.curate(
      spark.read.format("txnfeed").option("total", "30000").load()))
    val joined = win.as("w").join(twin.as("t"),
      Seq("ws_us", "payment_method"), "left")
    assert(joined.filter(col("t.n_txns").isNull).count() === 0,
      "stream emitted a window the batch twin does not have")
    assert(joined.filter(
      col("w.n_txns") =!= col("t.n_txns") ||
        col("w.sum_qty") =!= col("t.sum_qty") ||
        col("w.sum_amount_cents") =!= col("t.sum_amount_cents"))
      .count() === 0, "stream window values diverge from the batch twin")

    // the chain emitted the bulk of the feed's windows (only those
    // newer than the final watermark may still be in state): 30000
    // msgs = 300 s = 30 ten-second windows; watermark trails ~10 s
    assert(n >= 28 * 5 * 9 / 10,
      s"only $n window rows emitted — chain stalled")
  }
}
