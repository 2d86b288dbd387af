package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {

  test("lag-cumsum sessionization agrees with session_window semantics") {
    val ev = Tables.events(spark, sf)
    // batch session_window: same 6h gap rule, engine-native
    val sw = ev.groupBy(session_window(col("ts"), Sessionize.GAP),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val swCounts = sw.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    val lc = Sessionize.queries("sz_sessionize")(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    assert(lc === swCounts)
  }

  test("session durations are non-negative and bounded by the span") {
    val rows = Sessionize.queries("sz_sessionize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("duration_us")
      assert(d >= 0)
      if (r.getAs[Long]("n_events") == 1) assert(d === 0)
    }
  }

  test("funnel stages are strictly ordered and counts shrink monotonically") {
    val rows = graft.operators.EventAnalytics
      .queries("ev_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("view_us")
      if (!r.isNullAt(r.fieldIndex("click_us"))) {
        assert(r.getAs[Long]("click_us") > v)
        if (!r.isNullAt(r.fieldIndex("purchase_us")))
          assert(r.getAs[Long]("purchase_us") > r.getAs[Long]("click_us"))
      } else assert(r.isNullAt(r.fieldIndex("purchase_us")))
    }
    val nV = rows.length
    val nC = rows.count(r => !r.isNullAt(r.fieldIndex("click_us")))
    val nP = rows.count(r => !r.isNullAt(r.fieldIndex("purchase_us")))
    // at sf0.001 the streams are dense enough that all stages complete
    // (15/15/15, cross-checked in DuckDB) — the invariant is monotone
    // non-increase, narrowing is corpus-dependent
    assert(nV >= nC && nC >= nP && nP > 0)
  }

  test("retention: offset-0 row counts each cohort exactly once") {
    import org.apache.spark.sql.functions._
    val ret = graft.operators.EventAnalytics
      .queries("ev_retention")(spark, sf)
    val atZero = ret.filter(col("day_offset") === 0)
      .select("cohort_day", "users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cohorts = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id").agg(min("day").as("d"))
      .groupBy(col("d").cast("string")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every user is active on their own cohort day by definition
    assert(atZero === cohorts)
    // offsets never negative
    assert(ret.filter(col("day_offset") < 0).count() === 0)
  }

  test("attribution matrix equals a local first/last-touch replay") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(e => (e._4, e._2))
      ordered.zipWithIndex.collect {
        case ((_, _, "purchase", _), i) =>
          val prior = ordered.take(i).filter(_._3 != "purchase")
          (prior.headOption.map(_._3).getOrElse("none"),
            prior.lastOption.map(_._3).getOrElse("none"))
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.EventAnalytics
      .queries("ev_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    // total conservation: every purchase is attributed exactly once
    assert(got.values.sum === ev.count(_._3 == "purchase").toLong)
  }

  test("ev_segment_overlap counts pairwise audiences exactly") {
    val ut = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val aud = ut.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val byUser = ut.groupBy(_._1).values
    val want = byUser.flatMap { v =>
      val ts = v.map(_._2).sorted
      for (i <- ts.indices; j <- i + 1 until ts.length)
        yield (ts(i), ts(j))
    }.groupBy(identity).map { case ((a, b), v) =>
      (a, b) -> (aud(a), aud(b), v.size.toLong) }
    val got = graft.operators.EventAnalytics
      .queries("ev_segment_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
    // overlap is bounded by the smaller audience
    assert(got.forall { case (_, (na, nb, nboth)) =>
      nboth <= math.min(na, nb) })
  }

  test("ev_seq_patterns ranks trigram support over distinct users") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val t = rows.sortBy(e => (e._4, e._2)).map(_._3)
      t.sliding(3).filter(_.length == 3)
        .map(w => (u, (w(0), w(1), w(2)))).toSet
    }
    val support = tris.groupBy(_._2).map { case (t, v) =>
      t -> v.size.toLong }
    val want = support.toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(15)
    val got = graft.operators.EventAnalytics
      .queries("ev_seq_patterns")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toSeq
    assert(got === want)
    assert(got.size === 15)
  }

  test("ev_rfm: aligned dimensions produce the diagonal census") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    // user u makes u purchases of 1.00 on the same day: recency ties
    // (everyone scores r = 1), frequency and monetary are the same
    // 1..5 ordering → the census is the diagonal (1, k, k) ×1 user
    val evs = for { u <- 1 to 5; i <- 1 to u } yield
      (u.toLong, (u * 10 + i).toLong,
        new Timestamp(1704067200000L + i * 60000L), "purchase", 1.0)
    evs.toDF("user_id", "event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventAnalytics
      .queries("ev_rfm")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(got === (1 to 5).map(k => (1, k, k) -> 1L).toMap)
  }

  test("ev_window_funnel: depth respects the 6-hour anchor window") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(h: Int, m: Int = 0) =
      new Timestamp(1704067200000L + h * 3600000L + m * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("ev_wf").toString
    Seq(
      // user 1: full chain inside 6 h → level 3
      (1L, 1L, t(0), "view"), (1L, 2L, t(1), "click"),
      (1L, 3L, t(2), "purchase"),
      // user 2: click lands 7 h after the view → level 1
      (2L, 4L, t(0), "view"), (2L, 5L, t(7), "click"),
      // user 3: no view at all → level 0
      (3L, 6L, t(0), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventAnalytics
      .queries("ev_window_funnel")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 3L -> 1L))
  }

  test("ev_match_recognize: hand-traced pattern counts") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    val dir = java.nio.file.Files
      .createTempDirectory("ev_mr").toString
    // user 1: v c p v p  → "vcp" then "vp"           → 2 matches
    // user 2: v v c o p  → second v restarts, "vcop" → 1 match
    // user 3: p c o      → no view                   → 0 matches
    Seq(
      (1L, 1L, t(0), "view"), (1L, 2L, t(1), "click"),
      (1L, 3L, t(2), "purchase"), (1L, 4L, t(3), "view"),
      (1L, 5L, t(4), "purchase"),
      (2L, 6L, t(0), "view"), (2L, 7L, t(1), "view"),
      (2L, 8L, t(2), "click"), (2L, 9L, t(3), "error"),
      (2L, 10L, t(4), "purchase"),
      (3L, 11L, t(0), "purchase"), (3L, 12L, t(1), "click"),
      (3L, 13L, t(2), "signup"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventAnalytics
      .queries("ev_match_recognize")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got === Map(0L -> ((1L, 3L, 3L)), 1L -> ((1L, 2L, 2L)),
      2L -> ((1L, 1L, 1L))))
  }
}
