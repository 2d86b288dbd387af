package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends SparkSpec {

  private def brute(rows: Seq[(String, Long, Double, Int)])
      : Set[(String, Long, Double, Int)] =
    rows.filter { case (g, _, x, y) =>
      !rows.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.toSet

  test("two-phase skyline equals brute-force dominance on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0L until 500L).map { k =>
      (if (k % 3 == 0) "a" else "b", k,
        (rnd.nextInt(100) / 4.0), rnd.nextInt(50))
    }
    val got = Skyline.skyline(rows.toDF("g", "k", "x", "y")
        .repartition(7), "g", "k", "x", "y")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === brute(rows))
    assert(got.nonEmpty && got.size < rows.size)
  }

  test("duplicates of an undominated point all survive; ties don't dominate") {
    import spark.implicits._
    val rows = Seq(
      ("g", 1L, 1.0, 10), ("g", 2L, 1.0, 10), // duplicate frontier point
      ("g", 3L, 1.0, 9),                      // dominated (same x, lower y)
      ("g", 4L, 0.5, 10),                     // dominates keys 1,2? y equal,
                                              // x strictly lower → yes
      ("g", 5L, 2.0, 20))                     // frontier (higher y)
    val got = Skyline.skyline(rows.toDF("g", "k", "x", "y"), "g", "k",
        "x", "y").collect().map(_.getLong(1)).toSet
    assert(got === Set(4L, 5L))
    // without key 4, the duplicate pair is undominated and BOTH stay
    val got2 = Skyline.skyline(rows.filter(_._2 != 4L)
        .toDF("g", "k", "x", "y"), "g", "k", "x", "y")
      .collect().map(_.getLong(1)).toSet
    assert(got2 === Set(1L, 2L, 5L))
  }

  test("result is partitioning-invariant and named query matches NOT EXISTS") {
    val part = spark.read.parquet(s"$sf/part.parquet")
    val a = Skyline.skyline(part.withColumn("g", lit("all")).repartition(1),
      "g", "p_partkey", "p_retailprice", "p_size").collect()
      .map(_.getLong(1)).toSet
    val b = Skyline.skyline(part.withColumn("g", lit("all")).repartition(13),
      "g", "p_partkey", "p_retailprice", "p_size").collect()
      .map(_.getLong(1)).toSet
    assert(a === b)
    // brute-force replay of the named query's dominance contract
    val rows = part.select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => ("all", r.getLong(0), r.getDouble(1),
        r.getInt(2)))
    assert(a === brute(rows.toSeq).map(_._2))
  }
}
