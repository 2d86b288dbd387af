package graft

import org.apache.spark.sql.functions._
import graft.operators.Extensions

class ExtensionsSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact") {
    val rows = Tables(spark, sf, "orders")
      .agg(countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey")).as("approx"))
      .collect().head
    val exact = rows.getAs[Long]("exact").toDouble
    val approx = rows.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("rollup: grand total equals sum of leaf rows") {
    val rows = Extensions.queries("x_rollup")(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("seg") == "ALL"
      && r.getAs[String]("nation") == "ALL")
    assert(grand.length === 1)
    val leaves = rows.filter(r => r.getAs[String]("seg") != "ALL"
      && r.getAs[String]("nation") != "ALL")
    assert(leaves.map(_.getAs[Long]("n_cust")).sum ===
      grand.head.getAs[Long]("n_cust"))
  }

  test("running sum final value equals customer total") {
    val last = Extensions.queries("x_running_sum")(spark, sf)
      .groupBy("o_custkey").agg(max(col("running")).as("final"))
    val totals = Tables(spark, sf, "orders").groupBy("o_custkey")
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(38, 2))).as("total"))
    val joined = last.join(totals, "o_custkey")
      .filter(col("final") =!= col("total"))
    assert(joined.count() === 0)
  }

  test("locf fill equals a local forward-fill replay") {
    val ev = graft.Tables.events(spark, sf)
      .filter(col("user_id") < 20 && col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getDouble(3)))
    assert(ev.nonEmpty)
    val utc = java.time.ZoneOffset.UTC
    def dayOf(ts: java.sql.Timestamp) =
      ts.toInstant.atZone(utc).toLocalDate
    val (lo, hi) = (ev.map(e => dayOf(e._3)).min, ev.map(e => dayOf(e._3)).max)
    // per (user, day): value of the max-(ts, event_id) event
    val daily = ev.groupBy(e => (e._1, dayOf(e._3))).view
      .mapValues(_.maxBy(e => (e._3.getTime, e._2))._4).toMap
    val want = (for {
      u <- ev.map(_._1).distinct.sorted
      n <- 0L to java.time.temporal.ChronoUnit.DAYS.between(lo, hi)
      day = lo.plusDays(n)
    } yield {
      val filled = Iterator.iterate(day)(_.minusDays(1))
        .takeWhile(!_.isBefore(lo))
        .collectFirst { case d if daily.contains((u, d)) => daily((u, d)) }
      (u, day.toString, filled, daily.contains((u, day)))
    }).toSeq
    val got = Extensions.queries("x_locf_fill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3))).toSeq
    assert(got === want)
    // gaps exist and get filled: some row is unobserved but non-null
    assert(got.exists(r => !r._4 && r._3.nonEmpty))
  }

  test("x_key_gaps: bucketed successor plan equals one global lead") {
    val ks = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey").distinct()
      .collect().map(_.getLong(0)).sorted
    val want = ks.zip(ks.tail).collect {
      case (a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1) }
      .sortBy { case (s, _, l) => (-l, s) }.take(20).toSeq
    val got = Extensions.queries("x_key_gaps")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // cross-bucket correctness on a crafted frame: keys straddle a
    // bucket boundary with a hole across it, and whole buckets are
    // missing in between — the boundary pairing must fold the run of
    // empty buckets into ONE gap
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gaps").toString
    Seq(1020L, 1021L, 5000L, 5001L)
      .map(k => (k, "F")).toDF("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val crafted = Extensions.queries("x_key_gaps")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(crafted === Seq((1022L, 4999L, 3978L)))
  }

  test("x_bitmap_distinct equals exact count(distinct) per group") {
    import org.apache.spark.sql.functions._
    val got = Extensions.queries("x_bitmap_distinct")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_distinct")))
      .toMap
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("x_interpolate: hand-checked linear gap fill") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("interp").toString
    // user 5 purchases: 2 events on Jan 1, 8 events on Jan 4 → the
    // daily-count series 2,_,_,8 interpolates to 4 and 6 (num/den =
    // 12/3 and 18/3)
    def t(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d 0$i:00:00")
    val evs =
      (1 to 2).map(i => (5L, (10 + i).toLong, t(1, i), "purchase")) ++
        (1 to 8).map(i => (5L, (40 + i).toLong, t(4, i), "purchase"))
    evs.toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Extensions.queries("x_interpolate")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((5L, "2024-01-02", 3L, 12L),
      (5L, "2024-01-03", 3L, 18L)))
  }
}
