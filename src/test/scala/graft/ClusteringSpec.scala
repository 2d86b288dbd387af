package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Lloyd k-means (operators/Clustering.scala): the assign/recompute
  * primitives on handcrafted integer vectors with known answers, then
  * the end-to-end query's partition/consistency invariants on testdata.
  */
class ClusteringSpec extends SparkSpec {

  private def vec(v: Long*): Seq[Long] =
    v.toSeq ++ Seq.fill(64 - v.size)(0L)

  test("assign picks the exact-integer argmin with ties to the lower cid") {
    import spark.implicits._
    val e = Seq(
      (10L, vec(0L, 0L)),     // at centroid 0
      (11L, vec(90L, 0L)),    // nearer centroid 1 (dist 100 vs 8100)
      (12L, vec(50L, 0L))     // equidistant (2500) -> tie to cid 0
    ).toDF("vec_id", "q")
    val cents = Seq(
      (0L, vec(0L, 0L)),
      (1L, vec(100L, 0L))
    ).toDF("cid", "cq")
    val got = Clustering.assign(e, cents)
      .select("vec_id", "cid", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Array((10L, 0L, 0L), (11L, 1L, 100L), (12L, 0L, 2500L)))
  }

  test("recompute floor-divides (not truncates) negative coordinate sums") {
    import spark.implicits._
    // cluster 0: coords -3 and -4 -> mean -3.5 -> floor -4 (truncation
    // toward zero would give -3 and silently diverge from the oracle)
    val assigned = Seq(
      (0L, vec(-3L)), (0L, vec(-4L)),
      (1L, vec(7L)), (1L, vec(8L))
    ).toDF("cid", "q")
    val cents = Clustering.recompute(assigned)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
    assert(cents(0)._2.head === -4L)
    assert(cents(1)._2.head === 7L) // floor(7.5) = 7
    assert(cents(0)._2.drop(1).forall(_ === 0L))
  }

  test("kmeans facade trains centroids that drive the IVF ANN path") {
    val emb = Tables(spark, sf, "embeddings")
    val cents = graft.api.Vectors.kmeans(emb, k = 16, iters = 2)
    assert(cents.count() === 16)
    // trained centroids plug straight into IVF; recall vs exact brute
    // force stays high (probes=4 of 16 buckets)
    val q = emb.filter(col("vec_id") < 10)
    val ivf = graft.api.Vectors.topKIvf(q, emb, cents, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.api.Vectors.topK(q, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    info(s"IVF-on-trained-centroids recall@5: $recall")
    assert(recall >= 0.7, s"recall $recall")
  }

  test("ml_kmeans partitions the corpus: one non-negative assignment per vector") {
    val out = Clustering.queries("ml_kmeans")(spark, sf).cache()
    val n = Tables(spark, sf, "embeddings").count()
    assert(out.count() === n)
    assert(out.select("vec_id").distinct().count() === n)
    val bad = out.filter(col("cid") < 0 || col("cid") >= 8 ||
      col("dist") < 0).count()
    assert(bad === 0L)
    // the learned clustering is non-degenerate on real data: more than
    // one cluster survives two Lloyd rounds
    assert(out.select("cid").distinct().count() > 1)
    out.unpersist()
  }
}
