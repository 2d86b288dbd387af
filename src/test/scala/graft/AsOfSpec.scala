package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  test("as-of match is the latest click at-or-before each purchase") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts")))
      .toMap
    val types = Tables.events(spark, sf)
      .select("event_id", "event_type").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("event_type"))
      .toMap
    val clicksByUser = ev.filter { case (id, _) => types(id) == "click" }
      .toSeq.groupBy(_._2._1)

    val out = AsOf.queries("az_asof_join")(spark, sf).collect()
    assert(out.nonEmpty)
    var matched = 0
    out.foreach { r =>
      val pid = r.getAs[Long]("purchase_id")
      val (pu, pts) = ev(pid)
      val expected = clicksByUser.getOrElse(pu, Seq.empty)
        .filter { case (_, (_, cts)) => !cts.after(pts) }
        .sortBy(_._2._2.getTime)
        .lastOption.map(_._1)
      val got = if (r.isNullAt(1)) None else Some(r.getAs[Long]("click_id"))
      assert(got === expected, s"purchase $pid")
      if (got.isDefined) matched += 1
    }
    assert(matched > 0 && matched < out.length) // both branches exercised
  }

  test("range join counts only events in (t, t+60s] of the same user") {
    val out = AsOf.queries("az_range_join")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_following")).sum > 0)
  }

  test("interval join: bucketed counts equal the brute-force replay") {
    val DAY = 86400000000L
    val iv = Tables(spark, sf, "lineitem").select(
        expr("l_suppkey").as("s"),
        expr("l_orderkey * 10 + l_linenumber").as("id"),
        expr("unix_micros(cast(l_shipdate as timestamp))").as("a"),
        expr("unix_micros(cast(l_shipdate as timestamp)) + " +
          s"(1 + CAST(l_quantity AS BIGINT) % 14) * $DAY").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val want = iv.groupBy(_._1).map { case (s, rows) =>
      s -> rows.toSeq.combinations(2).count {
        case Seq(x, y) => x._3 <= y._4 && y._3 <= x._4
        case _ => false
      }.toLong
    }.filter(_._2 > 0)
    val got = AsOf.queries("iv_interval_join")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum > 0)
  }

  test("nearest join: |dt| is the true minimum, ties go backward") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
    val clicks = ev.filter(_.getString(2) == "click")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val purch = ev.filter(_.getString(2) == "purchase")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val out = AsOf.queries("az_asof_nearest")(spark, sf).collect()
    assert(out.length === purch.length)
    out.foreach { r =>
      val pid = r.getAs[Long]("purchase_id")
      val (_, pu, pus) = purch.find(_._1 == pid).get
      val cands = clicks.filter(_._2 == pu)
      if (cands.isEmpty) assert(r.isNullAt(1))
      else {
        val best = cands.map { case (cid, _, cus) =>
          (math.abs(cus - pus), if (cus <= pus) 0 else 1, -cid, cid)
        }.min
        assert(r.getAs[Long]("nearest_id") === best._4, s"purchase $pid")
        assert(r.getAs[Long]("dt_us") === best._1)
      }
    }
  }
}
