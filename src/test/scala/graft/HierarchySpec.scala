package graft

import graft.operators.Hierarchy

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def tree(nodes: Seq[Long]) =
    nodes.map(k => (k, if (k < 10) k else k / 10)).toDF("node", "parent")

  test("pointer jumping resolves roots and exact depths") {
    // a 6-level chain (5 -> 55 -> 555 -> ... -> 555555) plus a bushy
    // branch and a standalone root
    val nodes = Seq(5L, 55L, 555L, 5555L, 55555L, 555555L,
      57L, 570L, 571L, 5712L, 3L)
    val got = Hierarchy.flatten(tree(nodes))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // driver replay of the parent walk
    def walk(k: Long): (Long, Long) = {
      var cur = k; var d = 0L
      while (cur >= 10) { cur /= 10; d += 1 }
      (cur, d)
    }
    assert(got === nodes.map(k => k -> walk(k)).toMap)
    assert(got(555555L) === (5L, 5L))
    assert(got(3L) === (3L, 0L))
  }

  test("round count is ceil(log2(depth+1)), not depth") {
    // rounds(d) = smallest r with d <= 2^r - 1 (the done flag trails
    // the pointer by the partial sums 2^{r-1}+...+1): depth-5 chain →
    // 3 rounds, where a sequential walk pays 5 joins
    Hierarchy.flatten(
      tree(Seq(5L, 55L, 555L, 5555L, 55555L, 555555L))).collect()
    assert(Hierarchy.lastRounds === 3,
      s"expected 3 rounds for depth 5, got ${Hierarchy.lastRounds}")
    // all-roots input: zero rounds
    Hierarchy.flatten(tree(Seq(1L, 2L, 9L))).collect()
    assert(Hierarchy.lastRounds === 0)
    // arbitrary (non-arithmetic) parent pointers work the same:
    // a depth-15 chain on random ids needs ceil(log2(16)) = 4 rounds
    val ids = Seq(907L, 13L, 541L, 293L, 641L, 83L, 991L, 401L, 7L,
      617L, 157L, 769L, 443L, 31L, 877L, 101L)
    val chain = ids.zipWithIndex.map { case (k, i) =>
      (k, if (i == 0) k else ids(i - 1)) }.toDF("node", "parent")
    val got = Hierarchy.flatten(chain)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === ids.zipWithIndex
      .map { case (k, i) => k -> (ids.head, i.toLong) }.toMap)
    assert(Hierarchy.lastRounds === 4,
      s"expected 4 rounds for depth 15, got ${Hierarchy.lastRounds}")
  }

  test("flattenProd multiplies exact path quantities to the root") {
    // 5 -> 55 -> 555: qty(k) = k % 3 + 1 gives 555→55 qty 1 (555%3=0),
    // 55→5 qty 2; path products: node 555 = 1*2 = 2, node 55 = 2,
    // root 5 = 1
    val t = Seq(5L, 55L, 555L)
      .map(k => (k, if (k < 10) k else k / 10, k % 3 + 1))
      .toDF("node", "parent", "qty")
    val got = Hierarchy.flattenProd(t)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(5L -> (5L, 0L, 1L), 55L -> (5L, 1L, 2L),
      555L -> (5L, 2L, 2L)))
    // driver-side walk over the sf corpus tree agrees per root
    val keys = Tables(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    def walk(k: Long): (Long, Long, Long) = { // (root, depth, prod)
      var (cur, d, p) = (k, 0L, 1L)
      while (cur >= 10) { p *= cur % 3 + 1; cur /= 10; d += 1 }
      (cur, d, p)
    }
    val want = keys.map(k => (k, walk(k))).groupBy(_._2._1)
      .map { case (r, v) => r -> (v.length.toLong,
        v.map(_._2._3).sum, v.map(_._2._3).max, v.map(_._2._2).max) }
    val gotQ = Hierarchy.queries("hr_bom_explode")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toMap
    assert(gotQ === want)
  }
}
