package graft

import org.apache.spark.sql.functions._
import graft.operators.Diagnostics

/** The round-8 diagnostics batch: each query re-derived through an
  * independent Spark formulation or an internal-consistency identity
  * (the DuckDB hash gate is the cross-engine check; these pin the
  * semantics in-engine).
  */
class DiagnosticsSpec extends SparkSpec {

  test("ev_inactivity_gaps fold equals the lag-window formulation") {
    val fold = Diagnostics.queries("ev_inactivity_gaps")(spark, sf)
      .collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val win = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("gap") > 604800000000L, 1)).as("n_gaps_7d"),
        coalesce(max("gap"), lit(0L)).as("max_gap_us"))
      .orderBy("user_id").collect()
    assert(fold.length == win.length && fold.nonEmpty)
    fold.zip(win).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("ev_bot_rank flag is exactly the 5x-median rule on its own columns") {
    val rows = Diagnostics.queries("ev_bot_rank")(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select("user_id")
      .distinct().count()
    assert(rows.length == math.min(20L, nUsers))
    rows.foreach { r =>
      val maxDaily = r.getAs[Long]("max_daily")
      val med2 = r.getAs[Long]("med2")
      val flag = r.getAs[Int]("bot_flag")
      assert(flag == (if (maxDaily * 2 >= med2 * 5) 1 else 0))
    }
    val sorted = rows.map(_.getAs[Long]("max_daily"))
    assert(sorted.sameElements(sorted.sorted(Ordering[Long].reverse)))
  }

  test("ev_time_to_convert counts only post-view purchases") {
    val hist = Diagnostics.queries("ev_time_to_convert")(spark, sf)
      .agg(sum("n_users")).head().getLong(0)
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val expected = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("vus"))
      .join(e.filter(col("event_type") === "purchase"), "user_id")
      .filter(col("us") > col("vus"))
      .select("user_id").distinct().count()
    assert(hist == expected && hist > 0)
  }

  test("ev_hourly_profile shares are exact per-mille of its own counts") {
    val rows = Diagnostics.queries("ev_hourly_profile")(spark, sf)
      .collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      assert(r.getAs[Long]("purchase_pm") ==
        r.getAs[Long]("n_purchases") * 1000 / r.getAs[Long]("n_events"))
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("ta_zipf_fit slope is negative and the fit uses the full slice") {
    val r = Diagnostics.queries("ta_zipf_fit")(spark, sf).head()
    val vocab = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .select("term").distinct().count()
    assert(r.getAs[Long]("n") == math.min(1000L, vocab))
    assert(r.getAs[Long]("slope_micro") < 0, "Zipf slope must be negative")
  }

  test("gr_degree_census partitions every customer exactly once") {
    val rows = Diagnostics.queries("gr_degree_census")(spark, sf)
      .collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    assert(total == Tables(spark, sf, "customer").count())
    assert(rows.map(_.getAs[Long]("degree")).forall(d => d >= 0 && d <= 31))
  }
}
