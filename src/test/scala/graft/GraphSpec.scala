package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hub outranks leaves, damped floor arithmetic is exact") {
    // star: hub 1 ↔ leaves 3,5,7 (odd/even parity irrelevant here)
    val pairs = Seq((0L, 3L), (0L, 5L), (0L, 7L))
    val directed = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val deg = directed.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = directed.join(deg, "src").cache()
    val nodes = edges.select(col("src").as("node")).distinct()
    val r0 = nodes.withColumn("r", lit(1000000L))
    val r = (1 to 3).foldLeft(r0)((acc, _) => Graph.step(edges, acc))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // hand replay: leaves each send r/1, hub sends r/3 to each leaf
    // i1: hub = 150000 + 85*3000000/100 = 2700000
    //     leaf = 150000 + 85*(1000000/3=333333)/100 = 433333
    assert(r(0L) > r(3L))
    assert(r(3L) === r(5L) && r(5L) === r(7L))
    // exact replay of the integer recurrence
    var hub = 1000000L; var leaf = 1000000L
    for (_ <- 1 to 3) {
      val nh = 150000L + 85L * (3 * leaf) / 100
      val nl = 150000L + 85L * (hub / 3) / 100
      hub = nh; leaf = nl
    }
    assert(r(0L) === hub)
    assert(r(3L) === leaf)
  }

  test("pagerank on the lake graph: mass conserved within floor loss") {
    val ranks = Graph.queries("gr_pagerank")(spark, sf)
      .agg(sum("rank_millionths"), count(lit(1))).collect().head
    val total = ranks.getLong(0)
    val n = ranks.getLong(1)
    // each iteration redistributes ~all mass: total stays within
    // [0.85·n·base, n·base] — floor losses only ever shrink it
    assert(total <= n * 1000000L)
    assert(total > (n * 1000000L * 7) / 10)
    // both partitions of the bipartite graph are ranked
    val kinds = Graph.queries("gr_pagerank")(spark, sf)
      .select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("customer", "supplier"))
  }
}
