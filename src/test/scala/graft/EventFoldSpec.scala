package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Sessionize}

/** The ordered-fold migrations (api.Folds): parity against the
  * formulations they replaced, and the hot-entity bound the round-7
  * verdict demanded — per-entity state must be O(|pattern|), with NO
  * collect_list trace buffer anywhere in the plan, even when one
  * entity holds a million events.
  */
class EventFoldSpec extends SparkSpec {

  test("sz_sessionize fold equals the lag-flag window formulation") {
    val fold = Sessionize.queries("sz_sessionize")(spark, sf).collect()
    val win = Sessionize.sessionizeWindowed(spark, sf).collect()
    assert(fold.length == win.length && fold.length > 0)
    fold.zip(win).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("matchCountsOf fold equals the trace+regex formulation") {
    val coded = EventAnalytics.funnelCoded(spark, sf)
    val fold = EventAnalytics.matchCountsOf(coded, "v[co]*p")
      .orderBy("user_id").collect()
    // the retired plan, inlined as the reference: trace aggregation +
    // codegen regexp (exact for this corpus size)
    val trace = coded.toDF("user_id", "us", "event_id", "code")
      .groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"),
          col("code")))),
        x => x.getField("code")), "").as("trace"))
      .select(col("user_id"),
        size(regexp_extract_all(col("trace"), lit("v[co]*p"), lit(0)))
          .cast("long").as("n_matches"))
      .orderBy("user_id").collect()
    assert(fold.length == trace.length && fold.length > 0)
    fold.zip(trace).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("hot entity: 1M-event bot folds with no collect_list in the plan") {
    // one hyperactive entity (1M events cycling view→click→purchase)
    // among normal ones: the retired plan would build a 1M-char string
    // in ONE aggregation buffer; the fold keeps O(|pattern|) state and
    // the sort handles the wide run
    val n = 1000000L
    val hot = spark.range(n).selectExpr(
      "CAST(424242 AS BIGINT) AS user_id",
      "id AS us", "id AS event_id",
      "CASE CAST(id % 3 AS INT) WHEN 0 THEN 'v' WHEN 1 THEN 'c' " +
        "ELSE 'p' END AS code")
    val cold = spark.range(100).selectExpr(
      "id AS user_id", "id AS us", "id AS event_id", "'v' AS code")
    val df = EventAnalytics.matchCountsOf(hot.unionAll(cold), "v[co]*p")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"), s"trace buffer in plan:\n$plan")
    assert(plan.contains("FlatMapGroups") || plan.contains("MapGroups"),
      s"fold operator missing:\n$plan")
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // v,c,p cycling: every (v,c,p) triple is one match — n/3 matches
    assert(rows(424242L) == n / 3, s"got ${rows(424242L)}")
    assert(rows(7L) == 0L)
    assert(rows.size == 101)
  }

  test("ev_transitions fold equals the lead-window formulation") {
    val fold = operators.Affinity.queries("ev_transitions")(spark, sf)
      .collect()
    val win = operators.Affinity.transitionsWindowed(spark, sf).collect()
    assert(fold.length == win.length && fold.length > 0)
    fold.zip(win).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("ev_seq_patterns fold equals the two-lag window formulation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val fold = operators.EventAnalytics.seqPatternsOf(ev, 15).collect()
    val win = operators.EventAnalytics.seqPatternsWindowed(ev, 15).collect()
    assert(fold.length == win.length && fold.length > 0)
    fold.zip(win).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("ev_attribution fold equals the ignore-nulls window formulation") {
    val fold = operators.EventAnalytics.queries("ev_attribution")(spark, sf)
      .collect()
    val win = operators.EventAnalytics.attributionWindowed(spark, sf)
      .collect()
    assert(fold.length == win.length && fold.length > 0)
    fold.zip(win).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("ev_match_spans agrees with matchCountsOf and with the trace regex") {
    // per-user span count == the count query's n_matches, and every
    // span really is a v…p with only c/o between (checked on the
    // assembled traces — a third, local formulation)
    val spans = operators.EventAnalytics.queries("ev_match_spans")(spark, sf)
      .collect()
    val counts = operators.EventAnalytics
      .matchCountsOf(operators.EventAnalytics.funnelCoded(spark, sf),
        "v[co]*p")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUser = spans.groupBy(_.getLong(0)).view.mapValues(_.length.toLong)
    assert(spans.nonEmpty)
    counts.foreach { case (u, n) =>
      assert(perUser.getOrElse(u, 0L) == n, s"user $u: spans != count")
    }
    // spot-check span contents on the raw events of 5 users
    val byEvent = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    spans.take(200).foreach { r =>
      val (u, sid, eid) = (r.getLong(0), r.getLong(2), r.getLong(4))
      assert(byEvent((u, sid)) == "view", s"span start not a view: $r")
      assert(byEvent((u, eid)) == "purchase", s"span end not a purchase: $r")
    }
  }

  test("ev_match_rows is mutually consistent with spans and counts") {
    // three output modes of the same engine over the real corpus must
    // tell one story: each match's first/last row == its span's
    // endpoints, match_seq covers 1..n in span-start order, and
    // distinct match ordinals == the count query's n_matches
    val coded = operators.EventAnalytics.funnelCoded(spark, sf)
    val rows = operators.EventAnalytics.matchRowsOf(coded, "v[co]*p")
      .collect()
    val spans = operators.EventAnalytics.matchSpansOf(coded, "v[co]*p")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4))))
      .sortBy(t => (t._1, t._2))
    val counts = operators.EventAnalytics.matchCountsOf(coded, "v[co]*p")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && spans.nonEmpty)
    val byMatch = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
      .view.mapValues(_.sortBy(_.getLong(2))).toMap
    // per user: match_seq is exactly 1..count, in span start order
    val spansByUser = spans.groupBy(_._1)
    counts.foreach { case (u, n) =>
      val seqs = byMatch.keySet.filter(_._1 == u).map(_._2)
      assert(seqs == (1L to n).toSet, s"user $u: ordinals $seqs != 1..$n")
      val uSpans = spansByUser.getOrElse(u, Array.empty)
      (1L to n).foreach { k =>
        val m = byMatch((u, k))
        val (_, start, end) = uSpans((k - 1).toInt)
        assert((m.head.getLong(3), m.head.getLong(4)) == start,
          s"user $u match $k: first row != span start")
        assert((m.last.getLong(3), m.last.getLong(4)) == end,
          s"user $u match $k: last row != span end")
        // in-match ordinals are 1..len and the rows are v, [co]*, p
        assert(m.map(_.getLong(2)).toSeq == (1L to m.length).toSeq)
        assert(m.head.getString(5) == "v" && m.last.getString(5) == "p")
        assert(m.drop(1).dropRight(1).forall(r =>
          Set("c", "o")(r.getString(5))))
      }
    }
  }

  test("overlapCountsOf equals per-position java lookingAt over the " +
    "real corpus, including a non-disjoint pattern") {
    // the SKIP TO NEXT ROW fold (descending-order reversed-NFA subset
    // machine) against the assembled per-user traces — for the shipped
    // overlap pattern AND for v.*p, where find() counting needs the
    // speculation chain but start counting stays one bitset
    val coded = operators.EventAnalytics.funnelCoded(spark, sf)
    val traces = coded.orderBy("user_id", "us", "event_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(r => (r.getLong(1), r.getLong(2)))
        .map(_.getString(3)).mkString).toMap
    for (p <- Seq("v[co]*v", "v.*p")) {
      val jm = java.util.regex.Pattern.compile(p)
      val got = operators.EventAnalytics.overlapCountsOf(coded, p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == traces.keySet)
      got.foreach { case (u, n) =>
        val s = traces(u)
        val m = jm.matcher(s)
        val want =
          (0 until s.length).count(i => m.region(i, s.length).lookingAt())
        assert(n == want.toLong, s"user $u pattern $p: $n != $want")
      }
      assert(got.values.sum > 0, s"pattern $p never started")
    }
  }

  test("matchMeasuresOf is mutually consistent with rows and spans") {
    // the MEASURES mode must tell the same story as the other output
    // modes over the real corpus: endpoints == the span table,
    // n_events == the ALL ROWS row count per match, and sum_cents ==
    // the sum of the matched rows' cents re-derived independently by
    // joining the rows output back to the raw events
    val coded = operators.EventAnalytics.funnelCoded(spark, sf)
    val cents = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as v_cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val withVal = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id",
        """case event_type when 'view' then 'v' when 'click' then 'c'
           when 'purchase' then 'p' else 'o' end as code""",
        "cast(cast(value as decimal(18,2)) * 100 as long) as v_cents")
    val measures = operators.EventAnalytics
      .matchMeasuresOf(withVal, "v[co]*p").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
          r.getLong(6), r.getLong(7))).toMap
    val rows = operators.EventAnalytics.matchRowsOf(coded, "v[co]*p")
      .collect().groupBy(r => (r.getLong(0), r.getLong(1)))
    val spans = operators.EventAnalytics.matchSpansOf(coded, "v[co]*p")
      .collect()
    assert(measures.nonEmpty && rows.nonEmpty)
    assert(measures.keySet == rows.keySet,
      "measures and rows disagree on the match set")
    assert(measures.size == spans.length,
      "measures and spans disagree on the match count")
    measures.foreach { case ((u, seq), (ends, nEvents, sumCents)) =>
      val m = rows((u, seq)).sortBy(_.getLong(2))
      assert(nEvents == m.length.toLong, s"user $u match $seq: n_events")
      assert(ends == ((m.head.getLong(3), m.head.getLong(4),
        m.last.getLong(3), m.last.getLong(4))),
        s"user $u match $seq: endpoints != rows first/last")
      val expected = m.map(r => cents((u, r.getLong(4)))).sum
      assert(sumCents == expected,
        s"user $u match $seq: sum_cents $sumCents != $expected")
    }
  }

  test("matchRowsOf equals java.regex find() positions on random " +
    "traces (ordinals pinned, deeper disjoint patterns included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20261015L)
    // ab*c reaches chain depth 3 states; [^p]*p exercises negation
    for (pattern <- Seq("v[co]*p", "vc?p", "ab*c", "[^p]*p")) {
      val alpha = if (pattern.exists("vcpo".contains(_))) "vcpo" else "abcx"
      val traces = (1L to 30L).map(u =>
        u -> Array.fill(rnd.nextInt(120))(
          alpha(rnd.nextInt(alpha.length))).mkString).toMap
      val df = traces.toSeq.flatMap { case (u, t) =>
        t.zipWithIndex.map { case (c, i) =>
          (u, i.toLong * 10, i.toLong, c.toString)
        }
      }.toDF("user_id", "us", "event_id", "code")
      val got = operators.EventAnalytics.matchRowsOf(df, pattern)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getString(5))).toSeq
        .sortBy(t => (t._1, t._2, t._3))
      val want = traces.toSeq.flatMap { case (u, t) =>
        val m = java.util.regex.Pattern.compile(pattern).matcher(t)
        val out = scala.collection.mutable.ListBuffer
          .empty[(Long, Long, Long, Long, Long, String)]
        var seq = 0L
        while (m.find()) {
          seq += 1
          (m.start until m.end).zipWithIndex.foreach { case (p, ord) =>
            out += ((u, seq, ord + 1L, p.toLong * 10, p.toLong,
              t(p).toString))
          }
        }
        out
      }.sortBy(t => (t._1, t._2, t._3))
      assert(got == want, s"pattern $pattern")
    }
  }

  test("matchCountsClassified (DEFINE/PREV) equals a java.regex " +
    "replay of the same classification") {
    import spark.implicits._
    // random per-entity value walks; classify U/D/e against PREV
    // (first row 'o'), exactly the ev_updown_runs rule — the fold's
    // count must equal java.regex over the locally classified string,
    // for U+D and for a second pattern over the same alphabet
    val rnd = new scala.util.Random(20261115L)
    val data = (1L to 40L).flatMap { ent =>
      (0 until rnd.nextInt(60)).map(i =>
        (ent, i.toLong, rnd.nextInt(8).toDouble))
    }
    val df = data.toDF("ent", "seq", "v")
    def classifyStr(vs: Seq[Double]): String =
      vs.zipWithIndex.map { case (v, i) =>
        if (i == 0) 'o'
        else if (v > vs(i - 1)) 'U'
        else if (v < vs(i - 1)) 'D' else 'e'
      }.mkString
    val classify: (org.apache.spark.sql.Row,
      org.apache.spark.sql.Row) => Char = (prev, cur) =>
      if (prev == null) 'o'
      else {
        val p = prev.getDouble(2); val c = cur.getDouble(2)
        if (c > p) 'U' else if (c < p) 'D' else 'e'
      }
    for (pattern <- Seq("U+D", "U+D+", "eU*D")) {
      val got = operators.EventAnalytics.matchCountsClassified(
        df, pattern, Seq("ent"), Seq("seq"))(classify)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = data.groupBy(_._1).map { case (ent, rows) =>
        val s = classifyStr(rows.sortBy(_._2).map(_._3))
        val m = java.util.regex.Pattern.compile(pattern).matcher(s)
        var n = 0L
        while (m.find()) n += 1
        ent -> n
      }
      assert(got == want, s"pattern $pattern")
      if (pattern == "U+D") assert(got.values.sum > 0)
    }
    // the facade wires the same path
    val viaApi = api.Events.matchPatternBy(df, "U+D")(classify,
        idCol = "ent", tieCol = "seq", orderCol = "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = operators.EventAnalytics.matchCountsClassified(
      df, "U+D", Seq("ent"), Seq("seq", "seq"))(classify)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaApi == direct)
  }

  test("classified span family (DEFINE/PREV × spans/rows/measures) " +
    "equals a java.regex replay, mutually consistent across modes") {
    import spark.implicits._
    // random per-entity value walks with a long measure column; the
    // classified span/rows/measures folds must reproduce java.regex
    // find() spans over the locally classified string — positions
    // mapped back to ids — and agree with each other and with the
    // classified count fold
    val rnd = new scala.util.Random(20261116L)
    val data = (1L to 30L).flatMap { ent =>
      (0 until rnd.nextInt(50)).map(i =>
        (ent, i.toLong, rnd.nextInt(8).toDouble, rnd.nextInt(1000).toLong))
    }
    val df = data.toDF("ent", "seq", "v", "mv")
    def classifyStr(vs: Seq[Double]): String =
      vs.zipWithIndex.map { case (v, i) =>
        if (i == 0) 'o'
        else if (v > vs(i - 1)) 'U'
        else if (v < vs(i - 1)) 'D' else 'e'
      }.mkString
    val classify: (org.apache.spark.sql.Row,
      org.apache.spark.sql.Row) => Char = (prev, cur) =>
      if (prev == null) 'o'
      else {
        val p = prev.getDouble(2); val c = cur.getDouble(2)
        if (c > p) 'U' else if (c < p) 'D' else 'e'
      }
    for (pattern <- Seq("U+D", "eU*D", "UD?e")) {
      // local truth: find() spans over the classified string, as
      // (ent, matchSeq, startId, endId, n, sumMv, rows)
      val want = data.groupBy(_._1).toSeq.flatMap { case (ent, rows0) =>
        val rows = rows0.sortBy(_._2)
        val s = classifyStr(rows.map(_._3))
        val m = java.util.regex.Pattern.compile(pattern).matcher(s)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long, Long)]
        var k = 0L
        while (m.find()) {
          k += 1
          val span = (m.start() until m.end()).map(rows(_))
          out += ((ent, k, span.head._2, span.last._2,
            span.length.toLong, span.map(_._4).sum))
        }
        out
      }.sorted
      val spans = operators.EventAnalytics.matchSpansClassified(
        df, pattern, Seq("ent"), Seq("seq"), "seq")(classify)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
      assert(spans == want.map(w => (w._1, w._2, w._3, w._4, w._5)).sorted,
        s"spans for $pattern")
      assert(spans.nonEmpty, s"$pattern never matched")
      val meas = operators.EventAnalytics.matchMeasuresClassified(
        df, pattern, Seq("ent"), Seq("seq"), "seq", "mv")(classify)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
      assert(meas == want, s"measures for $pattern")
      // ALL ROWS: per (ent, seq) the covered ids in order, and the cls
      // labels match the local classification
      val gotRows = operators.EventAnalytics.matchRowsClassified(
        df, pattern, Seq("ent"), Seq("seq"), "seq")(classify)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4)))
      val byMatch = gotRows.groupBy(t => (t._1, t._2))
      assert(byMatch.size == want.size, s"rows match count for $pattern")
      want.foreach { w =>
        val rs = byMatch((w._1, w._2)).sortBy(_._3)
        assert(rs.head._4 == w._3 && rs.last._4 == w._4 &&
          rs.length.toLong == w._5, s"rows endpoints for $pattern $w")
        // cls labels replay the local classification at those ids
        val ent = data.filter(_._1 == w._1).sortBy(_._2)
        val str = classifyStr(ent.map(_._3))
        rs.foreach { r =>
          val pos = ent.indexWhere(_._2 == r._4)
          assert(r._5 == str.charAt(pos).toString,
            s"cls label for $pattern at $r")
        }
      }
      // counts agree with the span census
      val counts = operators.EventAnalytics.matchCountsClassified(
        df, pattern, Seq("ent"), Seq("seq"))(classify)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val spanCounts = spans.groupBy(_._1).view.mapValues(_.size.toLong)
      spanCounts.foreach { case (e, n) => assert(counts(e) == n) }
    }
    // facades wire the same paths — every classified/skip facade
    // pinned against its direct engine call on the same frame
    val viaApi = api.Events.matchSpansBy(df, "U+D")(classify,
      idCol = "ent", tieCol = "seq", orderCol = "seq").collect().toSeq
    val direct = operators.EventAnalytics.matchSpansClassified(
      df, "U+D", Seq("ent"), Seq("seq", "seq"), "seq")(classify)
      .collect().toSeq
    assert(viaApi == direct && viaApi.nonEmpty)
    assert(api.Events.matchRowsBy(df, "U+D")(classify, idCol = "ent",
        tieCol = "seq", orderCol = "seq").collect().toSeq ==
      operators.EventAnalytics.matchRowsClassified(
        df, "U+D", Seq("ent"), Seq("seq", "seq"), "seq")(classify)
        .collect().toSeq)
    assert(api.Events.matchMeasuresBy(df, "U+D", "mv")(classify,
        idCol = "ent", tieCol = "seq", orderCol = "seq").collect().toSeq ==
      operators.EventAnalytics.matchMeasuresClassified(
        df, "U+D", Seq("ent"), Seq("seq", "seq"), "seq", "mv")(classify)
        .collect().toSeq)
    val comps = Seq("s" -> ".", "d" -> "D+", "u" -> "U+")
    val toLast = graft.functions.RowPattern.SkipMode.ToLast("u")
    assert(api.Events.matchSpansSkipBy(df, comps, toLast)(classify,
        idCol = "ent", tieCol = "seq", orderCol = "seq").collect().toSeq ==
      operators.EventAnalytics.matchSpansSkip(
        df, comps, toLast, Seq("ent"), Seq("seq", "seq"), "seq")(classify)
        .collect().toSeq)
    assert(api.Events.matchRowsSkipBy(df, comps, toLast)(classify,
        idCol = "ent", tieCol = "seq", orderCol = "seq").collect().toSeq ==
      operators.EventAnalytics.matchRowsSkip(
        df, comps, toLast, Seq("ent"), Seq("seq", "seq"), "seq")(classify)
        .collect().toSeq)
    assert(api.Events.matchVarMeasuresBy(df, comps, toLast, "mv")(
        classify, idCol = "ent", tieCol = "seq", orderCol = "seq")
        .collect().toSeq ==
      operators.EventAnalytics.matchVarMeasures(
        df, comps, toLast, Seq("ent"), Seq("seq", "seq"), "seq", "mv")(
        classify).collect().toSeq)
    // non-disjoint pattern: span-family modes refuse loudly
    val e = intercept[IllegalArgumentException](
      operators.EventAnalytics.matchSpansClassified(
        df, "U+D+", Seq("ent"), Seq("seq"), "seq")(classify))
    assert(e.getMessage.contains("terminator-disjoint"))
  }

  test("SUBSET, RUNNING/FINAL, and PREV(col,2) equal java.regex " +
    "replays of the same classification (round 12)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20261210L)
    val data = (1L to 30L).flatMap { ent =>
      (0 until rnd.nextInt(50)).map(i =>
        (ent, i.toLong, rnd.nextInt(8).toDouble, rnd.nextInt(1000).toLong))
    }
    val df = data.toDF("ent", "seq", "v", "mv")
    def classifyStr(vs: Seq[Double], lag: Int): String =
      vs.zipWithIndex.map { case (v, i) =>
        if (i < lag) 'o'
        else if (v > vs(i - lag)) 'U'
        else if (v < vs(i - lag)) 'D' else 'e'
      }.mkString
    val classify: (org.apache.spark.sql.Row,
      org.apache.spark.sql.Row) => Char = (prev, cur) =>
      if (prev == null) 'o'
      else {
        val p = prev.getDouble(2); val c = cur.getDouble(2)
        if (c > p) 'U' else if (c < p) 'D' else 'e'
      }

    // --- SUBSET: java.regex groups replay under find() (PastLast) ---
    // comps (s=., d=D+, u=U+) as the anchored regex (.)(D+)(U+) with
    // each component captured; SUBSET w = (d, u) must sum exactly the
    // rows java.regex puts in groups 2 and 3
    val comps = Seq("s" -> ".", "d" -> "D+", "u" -> "U+")
    val pastLast = graft.functions.RowPattern.SkipMode.PastLast
    val gotSub = operators.EventAnalytics.matchVarMeasures(
      df, comps, pastLast, Seq("ent"), Seq("seq"), "seq", "mv",
      subsets = Seq("w" -> Seq("d", "u")))(classify)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        // cols: ent, match_seq, start_id, end_id, then
        // (s_n, s_sum, d_n, d_sum, u_n, u_sum, w_n, w_sum) at 4..11
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11)))
      .toSeq.sortBy(t => (t._1, t._2))
    val wantSub = data.groupBy(_._1).toSeq.flatMap { case (ent, rows0) =>
      val rows = rows0.sortBy(_._2)
      val s = classifyStr(rows.map(_._3), 1)
      val m = java.util.regex.Pattern.compile("(.)(D+)(U+)").matcher(s)
      val out = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      var k = 0L
      while (m.find()) {
        k += 1
        def agg(g: Int): (Long, Long) = {
          val span = (m.start(g) until m.end(g)).map(rows(_))
          (span.length.toLong, span.map(_._4).sum)
        }
        val (sn, ss) = agg(1); val (dn, ds) = agg(2); val (un, us) = agg(3)
        out += ((ent, k, sn, ss, dn, ds, un, us, dn + un, ds + us))
      }
      out
    }.sortBy(t => (t._1, t._2))
    assert(gotSub == wantSub && gotSub.nonEmpty, "subset replay")
    // subset validation is loud
    val eSub = intercept[IllegalArgumentException](
      operators.EventAnalytics.matchVarMeasures(
        df, comps, pastLast, Seq("ent"), Seq("seq"), "seq", "mv",
        subsets = Seq("w" -> Seq("d", "nope")))(classify))
    assert(eSub.getMessage.contains("not a declared component"))

    // --- RUNNING/FINAL at ALL ROWS grain: find() prefix-sum replay ---
    val gotRun = operators.EventAnalytics.matchRowsRunning(
      df, "U+D", Seq("ent"), Seq("seq"), "seq", "mv")(classify)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5), r.getLong(6)))
      .toSeq.sorted
    val wantRun = data.groupBy(_._1).toSeq.flatMap { case (ent, rows0) =>
      val rows = rows0.sortBy(_._2)
      val s = classifyStr(rows.map(_._3), 1)
      val m = java.util.regex.Pattern.compile("U+D").matcher(s)
      val out = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, Long, String, Long, Long)]
      var k = 0L
      while (m.find()) {
        k += 1
        val span = (m.start() until m.end()).map(rows(_))
        val fin = span.map(_._4).sum
        var run = 0L
        span.zipWithIndex.foreach { case (row, i) =>
          run += row._4
          out += ((ent, k, i + 1L, row._2,
            s.charAt(m.start() + i).toString, run, fin))
        }
      }
      out
    }.sorted
    assert(gotRun == wantRun && gotRun.nonEmpty, "running replay")
    // on each match's last row RUNNING == FINAL (the SQL:2016 law)
    gotRun.groupBy(t => (t._1, t._2)).values.foreach { rs =>
      val last = rs.maxBy(_._3)
      assert(last._6 == last._7, s"running != final on last row: $last")
    }

    // --- PREV(col, 2): two-lag classification, java.regex count ---
    val lagClassify: (collection.IndexedSeq[org.apache.spark.sql.Row],
      org.apache.spark.sql.Row) => Char = (prevs, cur) =>
      if (prevs.length < 2) 'o'
      else {
        val p = prevs.head.getDouble(2); val c = cur.getDouble(2)
        if (c > p) 'U' else if (c < p) 'D' else 'e'
      }
    for (pattern <- Seq("U+D", "eU*D")) {
      val got = operators.EventAnalytics.matchCountsClassifiedLag(
        df, pattern, Seq("ent"), Seq("seq"), lag = 2)(lagClassify)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = data.groupBy(_._1).map { case (ent, rows) =>
        val s = classifyStr(rows.sortBy(_._2).map(_._3), 2)
        val m = java.util.regex.Pattern.compile(pattern).matcher(s)
        var n = 0L
        while (m.find()) n += 1
        ent -> n
      }
      assert(got == want, s"lag-2 pattern $pattern")
      if (pattern == "U+D") assert(got.values.sum > 0)
    }
    intercept[IllegalArgumentException](
      operators.EventAnalytics.matchCountsClassifiedLag(
        df, "U+D", Seq("ent"), Seq("seq"), lag = 0)(lagClassify))

    // --- facades wire the same paths ---
    assert(api.Events.matchVarMeasuresBy(df, comps, pastLast, "mv",
        subsets = Seq("w" -> Seq("d", "u")))(
        classify, idCol = "ent", tieCol = "seq", orderCol = "seq")
        .collect().toSeq ==
      operators.EventAnalytics.matchVarMeasures(
        df, comps, pastLast, Seq("ent"), Seq("seq", "seq"), "seq", "mv",
        subsets = Seq("w" -> Seq("d", "u")))(classify).collect().toSeq)
    assert(api.Events.matchRowsRunningBy(df, "U+D", "mv")(
        classify, idCol = "ent", tieCol = "seq", orderCol = "seq")
        .collect().toSeq ==
      operators.EventAnalytics.matchRowsRunning(
        df, "U+D", Seq("ent"), Seq("seq", "seq"), "seq", "mv")(classify)
        .collect().toSeq)
    assert(api.Events.matchPatternByLag(df, "U+D", 2)(
        lagClassify, idCol = "ent", tieCol = "seq", orderCol = "seq")
        .collect().toSeq ==
      operators.EventAnalytics.matchCountsClassifiedLag(
        df, "U+D", Seq("ent"), Seq("seq", "seq"), 2)(lagClassify)
        .collect().toSeq)
  }

  test("FIRST/LAST value navigation equals java.regex group boundary " +
    "values, NULL on an empty component (round 13)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val data = (1L to 30L).flatMap { ent =>
      (0 until rnd.nextInt(50)).map(i =>
        (ent, i.toLong, rnd.nextInt(8).toDouble, rnd.nextInt(1000).toLong))
    }
    val df = data.toDF("ent", "seq", "v", "mv")
    def classifyStr(vs: Seq[Double]): String =
      vs.zipWithIndex.map { case (v, i) =>
        if (i < 1) 'o'
        else if (v > vs(i - 1)) 'U'
        else if (v < vs(i - 1)) 'D' else 'e'
      }.mkString
    val classify: (org.apache.spark.sql.Row,
      org.apache.spark.sql.Row) => Char = (prev, cur) =>
      if (prev == null) 'o'
      else {
        val p = prev.getDouble(2); val c = cur.getDouble(2)
        if (c > p) 'U' else if (c < p) 'D' else 'e'
      }
    // u = U* so some matches have an EMPTY up component — FIRST/LAST
    // over an empty variable must be NULL (SQL:2016 navigation-on-
    // empty), which count/sum MEASURES cannot distinguish from zero
    val comps = Seq("s" -> ".", "d" -> "D+", "u" -> "U*")
    val pastLast = graft.functions.RowPattern.SkipMode.PastLast
    val got = operators.EventAnalytics.matchVarNav(
      df, comps, pastLast, Seq("ent"), Seq("seq"), "seq", "mv")(classify)
      .collect().map { r =>
        def opt(i: Int): Option[Long] =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        // cols: ent, match_seq, start_id, end_id, then
        // (s_first, s_last, d_first, d_last, u_first, u_last) at 4..9
        (r.getLong(0), r.getLong(1), opt(4), opt(5), opt(6), opt(7),
          opt(8), opt(9))
      }.toSeq.sortBy(t => (t._1, t._2))
    val want = data.groupBy(_._1).toSeq.flatMap { case (ent, rows0) =>
      val rows = rows0.sortBy(_._2)
      val s = classifyStr(rows.map(_._3))
      val m = java.util.regex.Pattern.compile("(.)(D+)(U*)").matcher(s)
      val out = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Option[Long], Option[Long], Option[Long],
          Option[Long], Option[Long], Option[Long])]
      var k = 0L
      while (m.find()) {
        k += 1
        def nav(g: Int): (Option[Long], Option[Long]) =
          if (m.start(g) == m.end(g)) (None, None)
          else (Some(rows(m.start(g))._4), Some(rows(m.end(g) - 1)._4))
        val (sf, sl) = nav(1); val (dfi, dl) = nav(2); val (uf, ul) = nav(3)
        out += ((ent, k, sf, sl, dfi, dl, uf, ul))
      }
      out
    }.sortBy(t => (t._1, t._2))
    assert(got == want && got.nonEmpty, "first/last replay")
    // both empty and non-empty up components occurred (the NULL leg ran)
    assert(got.exists(_._7.isEmpty) && got.exists(_._7.nonEmpty))
    // one-row components: FIRST == LAST by construction (s is '.')
    got.foreach(t => assert(t._3 == t._4, s"s_first != s_last: $t"))
    // facade wires the same path
    assert(api.Events.matchVarNavBy(df, comps, pastLast, "mv")(
        classify, idCol = "ent", tieCol = "seq", orderCol = "seq")
        .collect().toSeq ==
      operators.EventAnalytics.matchVarNav(
        df, comps, pastLast, Seq("ent"), Seq("seq", "seq"), "seq", "mv")(
        classify).collect().toSeq)
  }

  test("matchVarNav is value-preserving: a NULL measure on a matched " +
    "boundary row navigates to NULL, not 0 (round 14 / ADVICE r13)") {
    import spark.implicits._
    // classification runs on v; mv carries NULLs on rows 2 and 4
    val df = Seq(
      (1L, 1L, 10.0, Some(100L)), (1L, 2L, 5.0, Option.empty[Long]),
      (1L, 3L, 4.0, Some(40L)), (1L, 4L, 8.0, Option.empty[Long]),
      (1L, 5L, 2.0, Some(20L))
    ).toDF("ent", "seq", "v", "mv")
    val classify: (org.apache.spark.sql.Row,
      org.apache.spark.sql.Row) => Char = (prev, cur) =>
      if (prev == null) 'o'
      else {
        val p = prev.getDouble(2); val c = cur.getDouble(2)
        if (c > p) 'U' else if (c < p) 'D' else 'e'
      }
    val comps = Seq("s" -> ".", "d" -> "D+", "u" -> "U*")
    val got = operators.EventAnalytics.matchVarNav(
      df, comps, graft.functions.RowPattern.SkipMode.PastLast,
      Seq("ent"), Seq("seq"), "seq", "mv")(classify).collect()
    // rows classify o D D U D → match: s={1}, d={2,3}, u={4}
    val m = got.find(r => r.getLong(1) == 1L).get
    def opt(i: Int): Option[Long] =
      if (m.isNullAt(i)) None else Some(m.getLong(i))
    assert(opt(4) == Some(100L) && opt(5) == Some(100L), m)
    // d_first is the NULL-valued row 2 — must navigate to NULL while
    // d_last reports row 3's 40 (pre-fix both coerced NULL to 0)
    assert(opt(6) == None && opt(7) == Some(40L), m)
    // u matched exactly one row whose measure is NULL: first == last ==
    // NULL by VALUE, distinct in cause from the empty-component case
    assert(opt(8) == None && opt(9) == None, m)
  }

  test("fold clients keep Window and collect_list out of their plans") {
    // the scale contract of the migrations: one keyed shuffle + sort +
    // object fold — no window pass, no per-entity array buffer
    for (q <- Seq("sz_sessionize", "ev_inactivity_gaps",
      "ev_match_recognize", "t10_cep_twin", "ev_match_spans",
      "ev_match_rows", "ev_updown_runs", "ev_updown_spans",
      "ev_updown_rows", "ev_updown_measures",
      "ev_transitions", "ev_seq_patterns", "ev_attribution")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("collect_list"), s"$q buffers a trace:\n$plan")
      assert(!plan.contains("Window"), s"$q still runs a window:\n$plan")
      assert(plan.contains("MapGroups"), s"$q lost the fold:\n$plan")
    }
  }

  test("api.Events.matchPattern: arbitrary non-disjoint pattern is exact") {
    // the facade's full input space, not just the shipped funnel: a
    // v.*p caller pattern (greedy loop consumes the terminator — the
    // round-8 weak spot) over the real events table must equal
    // java.util.regex find() counts on the assembled per-user traces
    val coded = operators.EventAnalytics.funnelCoded(spark, sf)
      .withColumnRenamed("us", "ts")
    val got = api.Events.matchPattern(coded, "v.*p", orderCol = "ts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val traces = coded.toDF("user_id", "ts", "event_id", "code")
      .orderBy("user_id", "ts", "event_id").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getString(3)).mkString }
    assert(got.keySet == traces.keySet && got.nonEmpty)
    traces.foreach { case (u, trace) =>
      val m = java.util.regex.Pattern.compile("v.*p").matcher(trace)
      var want = 0L
      while (m.find()) want += 1
      assert(got(u) == want, s"user $u: ${got(u)} != $want")
    }
  }

  test("api.Events.segmentOverlap leaves no cached RDD behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ev = Tables.events(spark, sf).select("user_id", "event_type")
    val out = api.Events.segmentOverlap(ev).collect()
    assert(out.nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"cached RDDs leaked: $leaked")
  }

  test("Hierarchy.flatten fails loudly on a cycle and an orphan parent") {
    import spark.implicits._
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("node", "parent")
    val e1 = intercept[IllegalArgumentException](
      api.Trees.flatten(cyc, "node", "parent").collect())
    assert(e1.getMessage.contains("cycle") ||
      e1.getMessage.contains("orphan"))
    val orphan = Seq((1L, 1L), (2L, 99L)).toDF("node", "parent")
    val e2 = intercept[IllegalArgumentException](
      api.Trees.flatten(orphan, "node", "parent").collect())
    assert(e2.getMessage.contains("orphan"))
  }
}
