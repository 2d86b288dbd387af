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
}
