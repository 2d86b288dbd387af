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
}
