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
}
