package graft

import org.apache.spark.sql.functions._
import graft.operators.Density

class DensitySpec extends SparkSpec {
  import spark.implicits._

  // brute-force DBSCAN replay on the driver (the definition, not the
  // grid algorithm): roles + min-core-label clusters + min-core-
  // neighbor border rule
  private def bruteDbscan(pts: Seq[(Long, Long, Long)], eps2: Long,
                          minPts: Int): Map[Long, (String, Long)] = {
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && d2(p, q) <= eps2)
        .map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(k => nbrs(k).size + 1 >= minPts).toSet
    // union-find over core-core adjacency
    val par = scala.collection.mutable.Map(core.map(k => k -> k).toSeq: _*)
    def find(a: Long): Long =
      if (par(a) == a) a else { par(a) = find(par(a)); par(a) }
    for (k <- core; n <- nbrs(k) if core(n)) {
      val (ra, rb) = (find(k), find(n))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }
    val lab = core.map(k => k -> find(k)).toMap
    pts.map { p =>
      val k = p._1
      if (core(k)) k -> ("core", lab(k))
      else {
        val coreN = nbrs(k).filter(core)
        if (coreN.nonEmpty) k -> ("border", coreN.map(lab).min)
        else k -> ("noise", -1L)
      }
    }.toMap
  }

  test("dbscan: crafted constellation gets exact roles and labels") {
    // blob A: 4 mutual neighbors (all core at minPts=4); blob B: a
    // 3-point chain (not core); border: one point near blob A only;
    // noise: isolated points; plus a second 5-point core blob far away
    val pts: Seq[(Long, Long, Long)] = Seq(
      (1L, 100L, 100L), (2L, 103L, 100L), (3L, 100L, 103L),
      (4L, 103L, 103L),                    // blob A - all pairwise ≤ 18
      (10L, 110L, 100L),                   // border: near 2 (d2=49)
      (20L, 300L, 300L), (21L, 304L, 300L), (22L, 308L, 300L), // chain
      (30L, 480L, 480L),                   // noise, isolated
      (40L, 200L, 50L), (41L, 203L, 50L), (42L, 206L, 50L),
      (43L, 203L, 53L), (44L, 203L, 47L)   // blob C
    )
    val eps2 = 64L; val cell = 8L; val minPts = 4
    val got = Density.dbscan(
        pts.toDF("k", "x", "y"), eps2, cell, minPts)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val want = bruteDbscan(pts, eps2, minPts)
    assert(got === want)
    // sanity on the shape itself, independent of the replay
    assert(got(1L) === ("core", 1L))
    assert(got(10L) === ("border", 1L))
    assert(got(30L) === ("noise", -1L))
    assert(got(40L)._1 === "core" && got(40L)._2 === 40L)
  }

  test("dbscan: randomized cross-check against the brute-force definition") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(k =>
      (k, rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    for ((eps2, cell, minPts) <- Seq((100L, 10L, 3), (225L, 15L, 5))) {
      val got = Density.dbscan(
          pts.toDF("k", "x", "y"), eps2, cell, minPts)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got === bruteDbscan(pts, eps2, minPts),
        s"eps2=$eps2 minPts=$minPts")
    }
  }

  test("grid neighbor join emits each directed pair exactly once") {
    // two points in the SAME cell and two straddling a cell boundary —
    // the 3x3 probe explode must not double-count either case
    val pts = Seq((1L, 5L, 5L), (2L, 6L, 5L), (3L, 15L, 5L),
      (4L, 17L, 5L)).toDF("k", "x", "y")
    val pairs = Density.neighborPairs(pts, 64L, 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length)
    // 1-2 same cell, 2-3 crosses the x=8 boundary (d=9 > 8? d2=81>64 no)
    // 3-4 within eps across cell 1|2 boundary
    assert(pairs.toSet === Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)))
  }
}
