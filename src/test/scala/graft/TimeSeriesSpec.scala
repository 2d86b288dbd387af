package graft

import java.sql.Timestamp

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
}
