package graft

import org.apache.spark.sql.functions._
import graft.operators.Recommender

class RecommenderSpec extends SparkSpec {

  test("ml_recommend never recommends an already-purchased part") {
    val rec = Recommender.queries("ml_recommend")(spark, sf)
      .collect().map(r => (r.getAs[Long]("cust"), r.getAs[Long]("part")))
    assert(rec.nonEmpty)
    val purchased = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("cust"), r.getAs[Long]("part"))).toSet
    rec.foreach(p => assert(!purchased.contains(p), s"recommended owned $p"))
    // at most TOPK per customer
    rec.groupBy(_._1).foreach { case (_, rs) => assert(rs.length <= 3) }
  }

  test("ml_lsh_pipeline is seeded-deterministic and self-consistent") {
    def run() = Recommender.queries("ml_lsh_pipeline")(spark, sf)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    val first = run()
    assert(first.nonEmpty)
    first.foreach { case (a, b) => assert(a < b) }
    assert(run().toSeq === first.toSeq) // fixed seed → same pairs
  }

  test("M1: seeded sampling is deterministic") {
    val p = Tables(spark, sf, "part")
    val s1 = p.sample(withReplacement = false, 0.3, seed = 42)
      .select("p_partkey").collect().map(_.getLong(0)).toSeq
    val s2 = p.sample(withReplacement = false, 0.3, seed = 42)
      .select("p_partkey").collect().map(_.getLong(0)).toSeq
    assert(s1 === s2)
    assert(s1.nonEmpty && s1.length < 200)
  }
}
