package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("tm_ewma: hand-computed dyadic weights on a short series") {
    import spark.implicits._
    // one supplier, 3 observations q = 4, 2, 8 →
    //   weights (latest first) 512, 256, 128; den = 896
    //   num = 8*512 + 2*256 + 4*128 = 5120 → ewma = 5120/896
    val dir = java.nio.file.Files.createTempDirectory("tm_ewma").toString
    Seq(
      (7L, 1L, 1, ts("2024-01-01"), 4.0),
      (7L, 2L, 1, ts("2024-01-02"), 2.0),
      (7L, 3L, 1, ts("2024-01-03"), 8.0))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
        "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = TimeSeries.queries("tm_ewma")(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(r.fieldIndex("num")) === 5120L)
    assert(r.getLong(r.fieldIndex("den")) === 896L)
    assert(r.getDouble(r.fieldIndex("ewma_qty")) === 5120.0 / 896.0)
  }

  test("tm_ewma: full 10-lag horizon saturates the denominator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tm_ewma2").toString
    // 12 observations, constant q=5 → ewma must be exactly 5 and the
    // denominator the full geometric sum 1023
    (1 to 12).map(i => (1L, i.toLong, 1, ts(f"2024-01-$i%02d"), 5.0))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
        "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = TimeSeries.queries("tm_ewma")(spark, dir).collect().head
    assert(r.getLong(r.fieldIndex("den")) === 1023L)
    assert(r.getDouble(r.fieldIndex("ewma_qty")) === 5.0)
  }

  test("tm_holt: matrix unrolling equals the recursion it unrolls") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tm_holt").toString
    val ys = (1 to 12).map(_.toDouble)
    ys.zipWithIndex.map { case (y, i) =>
      (3L, (i + 1).toLong, 1, ts(f"2024-01-${i + 1}%02d"), y) }
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
        "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = TimeSeries.queries("tm_holt")(spark, dir).collect().head
    // the K-lag truncation IS the exact α=β=½ recursion zero-started
    // 10 observations back — replay it independently (all values are
    // dyadic rationals, so the double fold is exact)
    var l = 0.0; var b = 0.0
    ys.takeRight(10).foreach { y =>
      val nl = 0.5 * y + 0.5 * (l + b)
      b = 0.5 * (nl - l) + 0.5 * b
      l = nl
    }
    val den = r.getLong(r.fieldIndex("den")).toDouble
    assert(den === math.pow(4, 10))
    assert(r.getLong(r.fieldIndex("l_num")) / den === l)
    assert(r.getLong(r.fieldIndex("b_num")) / den === b)
    assert(r.getDouble(r.fieldIndex("forecast_1")) === l + b)
  }

  test("tm_holt: unrolling equals the recursion on 50 random series") {
    import spark.implicits._
    // property form of the hand test: for ANY integer series, the
    // K-lag matrix unrolling must equal the zero-init recursion run
    // over the last K observations (values are dyadic rationals, so
    // the double replay is exact). Seeded RNG — deterministic.
    val rng = new scala.util.Random(42)
    val series = (1 to 50).map { sid =>
      (sid.toLong, (1 to rng.nextInt(15) + 1).map(_ => rng.nextInt(50) + 1))
    }
    val dir = java.nio.file.Files.createTempDirectory("tm_holtp").toString
    series.flatMap { case (sid, ys) =>
      ys.zipWithIndex.map { case (y, i) =>
        (sid, (i + 1).toLong, 1, ts(f"2024-01-${i + 1}%02d"), y.toDouble) }
    }.toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
      "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = TimeSeries.queries("tm_holt")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val den = math.pow(4, 10)
    series.foreach { case (sid, ys) =>
      var l = 0.0; var b = 0.0
      ys.takeRight(10).foreach { y =>
        val nl = 0.5 * y + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
      }
      val r = got(sid)
      assert(r.getLong(r.fieldIndex("l_num")) / den === l, s"series $sid")
      assert(r.getLong(r.fieldIndex("b_num")) / den === b, s"series $sid")
    }
  }

  test("tm_seasonal: linear series decomposes to zero seasonal/residual") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tm_seas").toString
    // day i carries i orders, 14 consecutive days: a pure linear trend.
    // The centered 7-row sum of a linear series is 7× its center, so
    // dev7 = 7x − trend7 = 0 everywhere the window is full — seasonal
    // and residual must vanish exactly; the 3 edge days on each side
    // have no trend.
    val rows = for {
      i <- 1 to 14
      j <- 1 to i
    } yield (i.toLong * 1000 + j, ts(f"2024-03-$i%02d"))
    rows.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TimeSeries.queries("tm_seasonal")(spark, dir).collect()
    assert(got.length === 14)
    val byDay = got.map(r => r.getString(r.fieldIndex("day")) -> r).toMap
    (1 to 14).foreach { i =>
      val r = byDay(f"2024-03-$i%02d")
      if (i <= 3 || i >= 12) {
        assert(r.isNullAt(r.fieldIndex("trend7")), s"day $i edge")
      } else {
        assert(r.getLong(r.fieldIndex("dev7")) === 0L, s"day $i dev")
        assert(r.getLong(r.fieldIndex("resid_num")) === 0L, s"day $i")
      }
    }
    // every phase present in the full-window region sums to zero
    got.filter(!_.isNullAt(got.head.fieldIndex("seas_num")))
      .foreach(r => assert(r.getLong(r.fieldIndex("seas_num")) === 0L))
  }

  test("tm_ohlc: open/high/low/close and bar boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tm_ohlc").toString
    Seq(
      // January bar, order of shipment: 10, 30, 5 → open 10, close 5
      (1L, 1L, 1, ts("2024-01-03"), 10.0, 1.0),
      (1L, 2L, 1, ts("2024-01-10"), 30.0, 2.0),
      (1L, 3L, 1, ts("2024-01-20"), 5.0, 3.0),
      // February bar, single trade
      (1L, 4L, 1, ts("2024-02-01"), 7.0, 4.0),
      // same-day tie inside one bar breaks by (orderkey, linenumber)
      (2L, 5L, 1, ts("2024-03-05"), 1.0, 1.0),
      (2L, 5L, 2, ts("2024-03-05"), 2.0, 1.0))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
        "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = TimeSeries.queries("tm_ohlc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(r.fieldIndex("n_trades")),
        r.getDouble(r.fieldIndex("open")),
        r.getDouble(r.fieldIndex("high")),
        r.getDouble(r.fieldIndex("low")),
        r.getDouble(r.fieldIndex("close")),
        r.getDouble(r.fieldIndex("volume"))))
    assert(got === Array(
      (1L, "2024-01-01", 3L, 10.0, 30.0, 5.0, 5.0, 6.0),
      (1L, "2024-02-01", 1L, 7.0, 7.0, 7.0, 7.0, 4.0),
      (2L, "2024-03-01", 2L, 1.0, 2.0, 1.0, 2.0, 2.0)))
  }

  test("tm_acf: the distributed lag join equals a driver-side exact " +
      "replay on the named data (calendar gaps pair by DATE, not row)") {
    import org.apache.spark.sql.functions._
    val got = TimeSeries.queries("tm_acf")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // brute force on the driver: the quantized daily series as a
    // date→value map; a lag-l pair exists iff BOTH calendar days exist
    // (the equi-join semantics — lead(l) over a row window would skip
    // days across calendar gaps and undercount)
    val daily = graft.Tables(spark, sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("rev"))
      .select(col("day"), expr("rev div 1000").as("x"))
      .collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    for (l <- 1 to 7) {
      val pairs = daily.toSeq.flatMap { case (d, xa) =>
        daily.get(d.plusDays(l.toLong)).map(xb => (xa, xb)) }
      val n = pairs.length.toLong
      val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
      val sab = pairs.map(p => p._1 * p._2).sum
      val saa = pairs.map(p => p._1 * p._1).sum
      val sbb = pairs.map(p => p._2 * p._2).sum
      val exp = (l, n, n * sab - sa * sb, n * saa - sa * sa,
        n * sbb - sb * sb)
      assert(got(l - 1) === exp, s"lag $l")
    }
  }

  test("tm_changepoint: two-phase month-bucketed prefix sum equals " +
      "one global window; T_n = 0 identity holds") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = TimeSeries.queries("tm_changepoint")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val daily = graft.Tables(spark, sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy("day")
    val t = daily
      .withColumn("t_idx", row_number().over(w).cast("long"))
      .withColumn("p", sum("x").over(w))
      .crossJoin(broadcast(daily.agg(sum("x").as("s"),
        count(lit(1)).as("n"))))
      .select(col("day"), col("t_idx"),
        (col("n") * col("p") - col("t_idx") * col("s")).as("t"))
      .cache()
    val exp = t.orderBy(abs(col("t")).desc, col("day")).limit(3)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2)))
    assert(got.toSeq === exp.toSeq)
    // the centered cumulative sum returns to zero at the series end
    val last = t.orderBy(col("t_idx").desc).limit(1).collect()(0)
    assert(last.getLong(2) === 0L)
    t.unpersist()
  }

  test("tm_backtest scores the seasonal-naive replay exactly") {
    val daily = Tables(spark, sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1))
      .toMap
    val epoch = java.time.LocalDate.parse("1992-01-01")
    val want = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d.minusDays(7)).map(f => (d, x, f)) }
      .groupBy { case (d, _, _) =>
        java.time.temporal.ChronoUnit.DAYS.between(epoch, d) % 7 }
      .map { case (dow, v) =>
        dow -> (v.length.toLong, v.map(_._2).sum, v.map(_._3).sum,
          v.map(t => math.abs(t._2 - t._3)).sum,
          v.map(t => math.abs(t._2 - t._3)).max) }
    val got = TimeSeries.queries("tm_backtest")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got === want)
    assert(got.keySet === (0L to 6L).toSet) // full weekly coverage
    // the forecast is non-trivial: errors exist but are bounded by
    // the actual volume
    assert(got.values.map(_._4).sum > 0L)
    assert(got.values.map(_._4).sum < got.values.map(_._2).sum)
  }
}
