package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{CepMatcher, StreamingIngest}

class CepMatcherSpec extends SparkSpec {

  private def writeChunk(dir: java.nio.file.Path, name: String,
                         evs: Seq[(Long, Long, String, Int)]): Unit = {
    val lines = evs.map { case (id, user, tpe, hour) =>
      s"""{"event_id":$id,"user_id":$user,"event_type":"$tpe",""" +
        f""""value":1.0,"ts_str":"2024-01-01 $hour%02d:00:00.000000",""" +
        s""""props":"{}"}"""
    }
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes("UTF-8"))
  }

  test("CEP DFA carries open attempts and counts across batches") {
    val base = Files.createTempDirectory("graft_cep")
    val src = Files.createDirectory(base.resolve("src"))
    val cp = base.resolve("cp").toString
    val out = base.resolve("out").toString

    def runBatch(): Unit = {
      val q = CepMatcher
        .matches(spark, StreamingIngest.parse(
          spark.readStream.text(src.toString)))
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // user 1: view click | purchase view purchase → 2 matches, the
    //   first spanning the batch boundary through checkpointed state
    // user 2: purchase view | error purchase     → 1 match (v o p)
    writeChunk(src, "b1.json", Seq(
      (1L, 1L, "view", 1), (2L, 1L, "click", 2),
      (6L, 2L, "purchase", 1), (7L, 2L, "view", 2)))
    runBatch()
    val after1 = spark.read.parquet(out)
      .groupBy("user_id").agg(max("n_matches").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after1 === Map(1L -> 0L, 2L -> 0L))

    writeChunk(src, "b2.json", Seq(
      (3L, 1L, "purchase", 3), (4L, 1L, "view", 4),
      (5L, 1L, "purchase", 5),
      (8L, 2L, "error", 3), (9L, 2L, "purchase", 4)))
    runBatch()
    val after2 = spark.read.parquet(out)
      .groupBy("user_id").agg(max("n_matches").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after2 === Map(1L -> 2L, 2L -> 1L))
  }

  test("DFA fold ≡ regex scan on every trace over the code alphabet " +
    "(exhaustive to length 8)") {
    // the equivalence claim behind CepMatcher: the one-bit DFA counts
    // exactly the leftmost / non-overlapping / greedy matches of
    // v[co]*p. Exhaustively enumerate EVERY trace up to length 8 over
    // {v,c,p,o} (87 380 traces) and compare both counters.
    val alphabet = "vcpo"
    def regexCount(trace: String): Long =
      "v[co]*p".r.findAllIn(trace).length.toLong
    def dfaCount(trace: String): Long =
      CepMatcher.fold(open0 = false, 0L,
        trace.zipWithIndex.map { case (ch, i) =>
          CepMatcher.CepEvent(1L, i.toLong, i.toLong, ch.toString)
        })._2
    var checked = 0
    def rec(prefix: String): Unit = {
      if (prefix.nonEmpty) {
        assert(dfaCount(prefix) === regexCount(prefix), s"trace $prefix")
        checked += 1
      }
      if (prefix.length < 8) alphabet.foreach(c => rec(prefix + c))
    }
    rec("")
    assert(checked === (1 to 8).map(n => math.pow(4, n).toLong).sum)
  }

  test("t10_cep_twin equals the DFA fold run in batch mode") {
    val folded = CepMatcher.matches(spark, Tables.events(spark, sf))
      .collect().map(u => u.user_id -> u.n_matches).toMap
    val twin = operators.Streaming.queries("t10_cep_twin")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twin.nonEmpty)
    assert(twin === folded)
    // the corpus actually exercises the pattern
    assert(twin.values.exists(_ > 0))
  }

  test("cross-batch regression behind the fed frontier fails loudly") {
    // the round-10 ordering guard: the DFA's count is only defined
    // over event-time order, so an event arriving at or behind the
    // carried (ts_us, event_id) frontier must kill the query, never
    // silently corrupt the count
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import CepMatcher.{CepEvent, CepState}
    val s1 = TestGroupState.create[CepState](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(),
      hasTimedOut = false)
    CepMatcher.update(1L, Iterator(
      CepEvent(1L, 1L, 100L, "v"), CepEvent(1L, 2L, 300L, "p")), s1)
    assert(s1.get.matches == 1L && s1.get.last_ts == 300L)
    val s2 = TestGroupState.create[CepState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(),
      hasTimedOut = false)
    val e = intercept[IllegalStateException](CepMatcher.update(1L,
      Iterator(CepEvent(1L, 3L, 200L, "c")), s2))
    assert(e.getMessage.contains("ordering contract violated"))
    // equal (ts, id) — a duplicate delivery — is also behind
    val s3 = TestGroupState.create[CepState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(),
      hasTimedOut = false)
    intercept[IllegalStateException](CepMatcher.update(1L,
      Iterator(CepEvent(1L, 2L, 300L, "p")), s3))
    // and strictly past it is fine
    val s4 = TestGroupState.create[CepState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(),
      hasTimedOut = false)
    CepMatcher.update(1L, Iterator(CepEvent(1L, 4L, 400L, "v")), s4)
    assert(s4.get.open && s4.get.last_ts == 400L)
  }
}
