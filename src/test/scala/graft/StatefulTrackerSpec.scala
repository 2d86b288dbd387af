package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StatefulTracker, StreamingIngest}

class StatefulTrackerSpec extends SparkSpec {

  private def writeChunk(dir: java.nio.file.Path, name: String,
                         ids: Range): Unit = {
    val lines = ids.map { i =>
      s"""{"event_id":$i,"user_id":${i % 3},"event_type":"click",""" +
        s""""value":1.5,"ts_str":"2024-01-01 0${i % 10}:00:00.000000",""" +
        s""""props":"{}"}"""
    }
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes("UTF-8"))
  }

  test("flatMapGroupsWithState carries per-user state across batches") {
    val base = Files.createTempDirectory("graft_state")
    val src = Files.createDirectory(base.resolve("src"))
    val cp = base.resolve("cp").toString
    val out = base.resolve("out").toString

    def runBatch(): Unit = {
      // parquet sink: the memory sink cannot recover from a checkpoint,
      // and checkpoint recovery is exactly what this test exercises
      val q = StatefulTracker
        .track(spark, StreamingIngest.parse(
          spark.readStream.text(src.toString)))
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeChunk(src, "b1.json", 0 until 30) // 10 events per user 0,1,2
    runBatch()
    val after1 = spark.read.parquet(out)
      .groupBy("user_id").agg(max("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after1 === Map(0L -> 10L, 1L -> 10L, 2L -> 10L))

    writeChunk(src, "b2.json", 30 until 45) // +5 per user
    runBatch()
    val after2 = spark.read.parquet(out)
      .groupBy("user_id").agg(max("n_events").as("n"),
        max("total_value").as("tv")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // counts continued from checkpointed state: 10 + 5
    assert(after2.view.mapValues(_._1).toMap ===
      Map(0L -> 15L, 1L -> 15L, 2L -> 15L))
    assert(after2(0L)._2 === 15 * 1.5)
  }

  test("st_state_twin equals the state fold run in batch mode") {
    // The oracle-paired twin is a plain aggregate; prove it computes
    // the same final state the flatMapGroupsWithState fold reaches when
    // draining the events table as one batch.
    val folded = StatefulTracker.track(spark, Tables.events(spark, sf))
      .collect().map(u => u.user_id -> u).toMap
    val twin = operators.Streaming.queries("st_state_twin")(spark, sf)
      .collect()
    assert(twin.nonEmpty)
    assert(twin.length === folded.size)
    twin.foreach { r =>
      val u = folded(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") === u.n_events)
      assert(r.getAs[Long]("max_ts_us") === u.max_ts_us)
      // the fold sums doubles sequentially, the twin sums decimals —
      // equal up to double rounding
      assert(math.abs(r.getAs[Double]("total_value") - u.total_value)
        < 1e-6 * math.max(1.0, math.abs(u.total_value)))
    }
  }
}
