package graft

import java.sql.Timestamp

import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {

  test("expectation suite counts injected violations exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    // 5 customers: 1 out-of-range balance, 2 negative, 1 bad segment
    Seq(
      (1L, "a", 1, 500.0, "BUILDING"),
      (2L, "b", 1, -50.0, "BUILDING"),
      (3L, "c", 1, -20000.0, "PLASTICS"), // range AND nonneg AND domain
      (4L, "d", 1, 9999.0, "MACHINERY"),
      (5L, "e", 1, 0.0, "FURNITURE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, "O", 10.0, Timestamp.valueOf("1990-01-01 00:00:00"),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 99.0, 1.0, 0.05, 0.0, "N", "O",
        Timestamp.valueOf("1990-02-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = DataQuality.queries("dq_expect_suite")(spark, dir)
      .collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got("c_acctbal_range") === ((1L, false)))
    assert(got("c_acctbal_nonneg") === ((2L, false)))
    assert(got("c_mktsegment_domain") === ((1L, false)))
    assert(got("c_custkey_not_null") === ((0L, true)))
    assert(got("o_orderdate_range") === ((1L, false)))
    assert(got("l_quantity_range") === ((1L, false)))
    assert(got("l_discount_range") === ((0L, true)))
  }

  test("referential audit: orphans and childless parents counted by key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dq_ref").toString
    Seq((1L, "a", 1, 0.0, "BUILDING"), (2L, "b", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // custkey 9 is an orphan twice → ONE orphan key; customer 2 childless
    Seq((10L, 1L, "O", 1.0, Timestamp.valueOf("1995-01-01 00:00:00"), "x"),
      (11L, 9L, "O", 1.0, Timestamp.valueOf("1995-01-01 00:00:00"), "x"),
      (12L, 9L, "O", 1.0, Timestamp.valueOf("1995-01-01 00:00:00"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Long, Long, Int)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq.empty[Tuple1[Long]].toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq.empty[Tuple1[Long]].toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = DataQuality.queries("dq_referential")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("orders.o_custkey->customer") === ((2L, 1L)))
    assert(got("customer<-orders (childless)") === ((2L, 1L)))
    assert(got("lineitem.l_orderkey->orders") === ((0L, 0L)))
  }

  test("dq_profile matches a driver-side per-column census") {
    val cust = spark.read.parquet(s"$sf/customer.parquet").collect()
    val n = cust.length.toLong
    // the same engine-portable renderings the operator profiles
    val rendered: Map[String, Array[String]] = Map(
      "c_custkey" -> cust.map(_.getAs[Long]("c_custkey").toString),
      "c_name" -> cust.map(_.getAs[String]("c_name")),
      "c_nationkey" -> cust.map(_.getAs[Int]("c_nationkey").toString),
      "c_acctbal" -> cust.map(r =>
        r.getAs[Double]("c_acctbal").toLong.toString), // toward zero
      "c_mktsegment" -> cust.map(_.getAs[String]("c_mktsegment")))
    val got = graft.operators.DataQuality.queries("dq_profile")(spark, sf)
      .collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6), r.getLong(7)))
      .toMap
    assert(got.keySet === rendered.keySet)
    for ((c, vs) <- rendered) {
      val (nr, nn, nd, mn, mx, sl) = got(c)
      assert(nr === n && nn === 0L, c)
      assert(nd === vs.distinct.length.toLong, c)
      assert(mn === vs.min && mx === vs.max, c)
      assert(sl === vs.map(_.length.toLong).sum, c)
    }
  }

  test("dq_mad_outliers flags a planted spike against median/MAD") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    // 7 quiet days at 5 orders/day plus one 50-order spike: median 5,
    // MAD 0 → the spike's modified z is unbounded, quiet days are 0
    val rows = (1 to 7).flatMap(d => (1 to 5).map(i =>
      ((d * 100 + i).toLong, Timestamp.valueOf(f"2024-02-$d%02d 00:00:00")))) ++
      (1 to 50).map(i => ((800 + i).toLong,
        Timestamp.valueOf("2024-02-08 00:00:00")))
    rows.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.DataQuality
      .queries("dq_mad_outliers")(spark, dir).collect()
    assert(got.length === 8)
    val top = got.head
    assert(top.getString(top.fieldIndex("day")) === "2024-02-08")
    assert(top.getLong(top.fieldIndex("x")) === 50L)
    assert(top.getInt(top.fieldIndex("is_outlier")) === 1)
    got.tail.foreach(r =>
      assert(r.getInt(r.fieldIndex("is_outlier")) === 0))
    // integer gate replay: flag iff 13490·dev_x4 > 35000·mad_x8
    got.foreach { r =>
      val want = if (13490L * r.getLong(r.fieldIndex("dev_x4")) >
        35000L * r.getLong(r.fieldIndex("mad_x8"))) 1 else 0
      assert(r.getInt(r.fieldIndex("is_outlier")) === want)
    }
  }
}
