package graft

import org.apache.spark.sql.functions._
import graft.functions.CardSketch
import graft.operators.Sketch

class SketchSpec extends SparkSpec {

  test("sketch estimate within 2.3σ of exact distinct count (m=64)") {
    CardSketch.register(spark)
    // sf0.01: n≈1400 >> m, the raw-HLL regime (sf0.001's n=150 sits in
    // the noisy linear-counting crossover for a 64-register sketch)
    val row = Tables(spark, "/root/testdata/sf0.01", "orders")
      .agg(expr("card_sketch(cast(o_custkey as string))").as("registers"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect().head
    val est = CardSketch.estimate(row.getAs[String]("registers"))
    val exact = row.getAs[Long]("exact").toDouble
    // σ ≈ 1.04/√64 = 13%; 2.3σ = 30%
    val err = math.abs(est - exact) / exact
    assert(err < 0.3, s"estimate $est vs exact $exact (err $err)")
  }

  test("sketch is insensitive to duplication and partitioning") {
    CardSketch.register(spark)
    def regs(df: org.apache.spark.sql.DataFrame): String = df
      .agg(expr("card_sketch(cast(o_custkey as string))").as("r"))
      .collect().head.getAs[String]("r")
    val o = Tables(spark, sf, "orders")
    val base = regs(o)
    assert(regs(o.unionAll(o)) === base)       // duplicates don't move max
    assert(regs(o.repartition(13)) === base)   // merge order irrelevant
  }
}
