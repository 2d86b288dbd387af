package graft

import org.apache.spark.sql.functions._
import graft.operators.{Affinity, Spatial, Walks}

class AffinitySpec extends SparkSpec {

  test("mb_item_pairs: counts are symmetric-consistent and lift inputs exact") {
    val out = Affinity.queries("mb_item_pairs")(spark, sf).collect()
    assert(out.nonEmpty)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val byPart = li.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nBaskets = li.select("l_orderkey").distinct().count()
    out.foreach { r =>
      val (p1, p2) = (r.getLong(0), r.getLong(1))
      assert(p1 < p2)
      assert(r.getLong(2) >= 2)                    // c12 >= minsup
      assert(r.getLong(3) === byPart(p1))          // c1 exact
      assert(r.getLong(4) === byPart(p2))          // c2 exact
      assert(r.getLong(2) <= math.min(byPart(p1), byPart(p2)))
      assert(r.getLong(5) === nBaskets)
    }
    // ordering contract: c12 non-increasing
    val c12s = out.map(_.getLong(2))
    assert(c12s.zip(c12s.tail).forall { case (a, b) => a >= b })
  }

  test("ev_transitions: row totals add up and transitions follow time order") {
    val out = Affinity.queries("ev_transitions")(spark, sf).collect()
    assert(out.nonEmpty)
    // n_from is the sum of n over the from-state's rows
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val total = rows.map(_.getLong(2)).sum
      rows.foreach(r => assert(r.getLong(3) === total))
    }
    // total transitions = events - distinct users with >=1 event
    val e = Tables.events(spark, sf)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(out.map(_.getLong(2)).sum === expected)
  }

  test("geo_radius_join matches a brute-force cross join; knn picks the min") {
    val got = Spatial.queries("geo_radius_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cu = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val su = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey").collect().map(_.getLong(0))
    val brute = (for {
      c <- cu; s2 <- su
      dx = c * 37 % 1000 - s2 * 41 % 1000
      dy = c * 73 % 1000 - s2 * 97 % 1000
      d2 = dx * dx + dy * dy if d2 <= 64
    } yield (c, s2, d2)).toSet
    assert(got === brute)
    assert(got.nonEmpty) // the fixture radius actually finds pairs
    val knn = Spatial.queries("geo_grid_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bestByC = brute.groupBy(_._1).map { case (c, ps) =>
      c -> ps.minBy(p => (p._3, p._2))
    }
    assert(knn.toSet === bestByC.values.toSet)
    assert(knn.map(_._1).distinct.length === knn.length)
  }

  test("geo_point_in_poly: cross-product census equals a driver replay " +
      "and boundary points count as inside") {
    val hex = Seq((800L, 500L), (650L, 760L), (350L, 760L), (200L, 500L),
      (350L, 240L), (650L, 240L))
    def inside(px: Long, py: Long): Boolean = hex.indices.forall { i =>
      val (x1, y1) = hex(i)
      val (x2, y2) = hex((i + 1) % hex.length)
      (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0
    }
    // the rule itself: center in, far corner out, vertex ON boundary in
    assert(inside(500, 500) && !inside(0, 0) && inside(800, 500))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = cust.groupBy(_._2).map { case (seg, v) =>
      seg -> (v.length.toLong,
        v.count(t => inside(t._1 * 37 % 1000, t._1 * 73 % 1000)).toLong) }
    val got = Spatial.queries("geo_point_in_poly")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === want)
    // the fence is non-trivial on this corpus: both sides populated
    assert(got.values.map(_._2).sum > 0)
    assert(got.values.map(_._2).sum < got.values.map(_._1).sum)
  }

  test("gr_walks: every step follows a real edge chosen by the pinned hash") {
    val out = Walks.queries("gr_walks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val byWalk = out.groupBy(_._1)
    // every walk has exactly L+1 positions starting at its walk_id
    byWalk.foreach { case (wid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
      assert(sorted.head._3 === wid)
    }
    // replay the hash walk on a driver-side adjacency copy
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_partkey") + 10000000L).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e0 ++ e0.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (s2, es) =>
        s2 -> es.map(_._2).sorted
      }
    def h(v: Long, t: Long) =
      ((v % 1000000007L) * 1315423911L + t * 2654435761L) % 1000000007L
    byWalk.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2).map(_._3)
      for (t <- 1 to 3) {
        val prev = sorted(t - 1)
        val ns = adj(prev)
        assert(sorted(t) === ns((h(prev, t) % ns.length).toInt))
      }
    }
  }

  test("mb_assoc_rules grades a planted strong rule correctly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rules").toString
    // baskets: {A,B} ×3, {A} once, {C} ×2 → n = 6 baskets,
    // cA = 4, cB = 3, c12 = 3:
    //   A→B conf = 750 ‰, B→A conf = 1000 ‰, lift both = 1500 ‰
    val baskets = Seq(
      (1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 200L), (4L, 100L), (5L, 300L), (6L, 300L))
    baskets.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Affinity
      .queries("mb_assoc_rules")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(r.fieldIndex("conf_pm")),
          r.getLong(r.fieldIndex("lift_pm")),
          r.getInt(r.fieldIndex("strong"))))
    // B→A outranks A→B (same lift, higher confidence); both strong
    val byRule = got.toMap
    assert(got.head._1 === ((200L, 100L)))
    assert(byRule((200L, 100L)) === ((1000L, 1500L, 1)))
    assert(byRule((100L, 200L)) === ((750L, 1500L, 1)))
    assert(got.length === 2)
  }
}
