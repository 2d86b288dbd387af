package graft

import org.apache.spark.sql.functions._
import graft.operators.SemanticDedup

/** dd_semantic: SemDeDup-style cluster-then-prune semantic dedup. */
class SemanticDedupSpec extends SparkSpec {

  private val TH = 0.38

  test("semantic dedup: keeper precedes dropped and the pair really " +
      "exceeds the threshold") {
    val rows = SemanticDedup.queries("dd_semantic")(spark, sf).collect()
    assert(rows.nonEmpty, "threshold must actually fire on testdata")
    val vecs = Tables(spark, sf, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    rows.foreach { r =>
      val dropped = r.getAs[Long]("dropped")
      val keeper = r.getAs[Long]("keeper")
      assert(keeper < dropped, s"keeper $keeper !< dropped $dropped")
      // tolerance only covers the local naive-order float sum; the
      // query-vs-oracle compare is exact by construction
      assert(cos(vecs(keeper), vecs(dropped)) > TH - 1e-9,
        s"pair ($keeper, $dropped) below threshold")
    }
  }

  test("semantic dedup: candidates come from the cid equi-join — only " +
      "the broadcast centroid pass may nested-loop") {
    val plan = SemanticDedup.queries("dd_semantic")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val bnlj = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(_.contains("BuildRight")), plan)
  }
}
