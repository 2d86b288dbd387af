package graft

import org.apache.spark.sql.functions._
import graft.jobs.Upsert

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, inserts land, untouched rows survive") {
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "n")
    val updates = Seq((2L, "B2", 99), (4L, "d", 40)).toDF("k", "v", "n")
    val out = Upsert.merge(target, updates, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30),
      (4L, "d", 40)))
  }

  test("salted join equals unsalted join") {
    val salted = graft.operators.Maintenance
      .queries("sj_salted_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val li = Tables(spark, sf, "lineitem")
      .withColumn("sk_partkey",
        when(col("l_orderkey") % 3 === 0, lit(1L)).otherwise(col("l_partkey")))
    val plain = li.join(Tables(spark, sf, "part"),
        col("sk_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted === plain)
  }
}
