package graft

import org.apache.spark.sql.functions._

/** Runtime join-filter awareness: at 100 TB the cheapest shuffle is the
  * one the probe side never sends — Spark can inject a bloom-filter (or
  * semi-join) runtime filter on the fact side of a selective dim join,
  * so fact rows that cannot match are dropped at the SCAN, before the
  * exchange. The optimizer only fires when the creation side looks
  * selective and the application side is big enough; this spec pins the
  * CONFIG path (thresholds low enough to trigger on test data) so a
  * Spark upgrade that renames/disables the feature fails loudly rather
  * than silently costing a full-fact shuffle at scale.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom runtime filter injects on a selective dim-fact join") {
    val conf = spark.conf
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // AQE off: broadcast-reuse can legitimately replace the bloom
      // path; for the assertion we want the injected-filter plan itself
      conf.set("spark.sql.adaptive.enabled", "false")
      // the rule only fires for SHUFFLE joins (a broadcast join already
      // prunes at the probe); test data is small, so force the shuffle
      // shape the rule targets at warehouse scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables(spark, sf, "lineitem")
      val dim = Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered plan still computes the right answer
      val expect = fact.join(
        Tables(spark, sf, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey")).count()
      val got = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
      assert(got === expect)
    } finally prev.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
