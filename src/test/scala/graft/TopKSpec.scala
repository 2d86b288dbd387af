package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK

class TopKSpec extends SparkSpec {

  test("custom TopKPerGroup equals the window row_number formulation") {
    val c = Tables(spark, sf, "customer")
    val custom = TopK.perGroup(c, Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), 3)
      .select("c_mktsegment", "c_custkey")
      .orderBy("c_mktsegment", "c_custkey").collect()
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val window = c.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "c_custkey")
      .orderBy("c_mktsegment", "c_custkey").collect()
    assert(custom.map(_.toString).toSeq === window.map(_.toString).toSeq)
  }

  test("physical plan uses TopKPerGroupExec, not WindowExec") {
    val df = TopK.perGroup(Tables(spark, sf, "customer"),
      Seq("c_mktsegment"), Seq("c_acctbal" -> true), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.contains("Window"))
  }

  test("unknown column fails with a clear error") {
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(Tables(spark, sf, "customer"),
        Seq("no_such_col"), Seq("c_acctbal" -> true), 2)
    }
    assert(e.getMessage.contains("no_such_col"))
  }

  test("k=1 degenerates to per-group argmax") {
    val out = TopK.perGroup(Tables(spark, sf, "customer"),
      Seq("c_mktsegment"), Seq("c_acctbal" -> true, "c_custkey" -> false), 1)
      .collect()
    val segs = out.map(_.getAs[String]("c_mktsegment"))
    assert(segs.distinct.length === segs.length)
    val maxes = Tables(spark, sf, "customer").groupBy("c_mktsegment")
      .agg(max("c_acctbal").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Double]("c_acctbal") ===
        maxes(r.getAs[String]("c_mktsegment")))
    }
  }
}
