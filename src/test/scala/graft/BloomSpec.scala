package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomAgg
import graft.operators.JoinReduction

/** The explicit bloom build/probe pair (functions/BloomFilter.scala) —
  * complements RuntimeFilterSpec, which pins Spark's AUTOMATIC
  * injection path: this pair is for building a filter once and reusing
  * it across fact scans.
  */
class BloomSpec extends SparkSpec {

  test("bloom admits all dim keys and bounds false positives") {
    BloomAgg.register(spark)
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bits = dim.agg(expr("bloom_agg(o_orderkey)").as("bf"))
    // membership of every built key — zero misses allowed
    val misses = dim.crossJoin(broadcast(bits))
      .filter(!expr("bloom_contains(o_orderkey, bf)"))
      .count()
    assert(misses === 0L)
    // disjoint probe keys (shifted far past the key domain): the fpp
    // at this fill factor (~1.5k keys in 2^18 bits) is well under 1%
    val probes = spark.range(1000000, 1010000).toDF("k")
    val fp = probes.crossJoin(broadcast(bits))
      .filter(expr("bloom_contains(k, bf)"))
      .count()
    assert(fp < 100, s"false-positive count $fp of 10000 probes")
  }

  test("bitset is insensitive to partitioning and duplication") {
    BloomAgg.register(spark)
    def bitsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .agg(expr("bloom_agg(o_orderkey)").as("bf"))
      .collect().head.getSeq[Long](0)
    val o = Tables(spark, sf, "orders").select("o_orderkey")
    val base = bitsOf(o)
    assert(bitsOf(o.repartition(13)) === base)
    assert(bitsOf(o.unionAll(o)) === base)
  }

  test("bf_bloom_prune equals the plain exact join") {
    BloomAgg.register(spark)
    val got = JoinReduction.queries("bf_bloom_prune")(spark, sf)
      .collect().map(_.toSeq)
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plain = Tables(spark, sf, "lineitem")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(38,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(38,2)")).cast("double")
          .as("revenue"))
      .orderBy("l_linestatus")
      .collect().map(_.toSeq)
    assert(got === plain)
  }

  test("misuse is rejected at analysis time") {
    BloomAgg.register(spark)
    import spark.implicits._
    val bad = intercept[Exception] {
      Seq("a", "b").toDF("s").agg(expr("bloom_agg(s)")).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("integral"))
    val bad2 = intercept[Exception] {
      Seq((1L, "x")).toDF("k", "s")
        .select(expr("bloom_contains(k, s)")).collect()
    }
    assert(bad2.getMessage.toLowerCase.contains("array<bigint>"))
  }
}
