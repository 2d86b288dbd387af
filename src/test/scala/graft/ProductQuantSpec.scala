package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.ProductQuant

/** PQ/ADC ANN (operators/ProductQuant.scala): recall against the exact
  * integer brute force on the same quantized vectors, plus output-shape
  * invariants. The oracle pins cross-engine equality; this pins that
  * the approximation is actually GOOD.
  */
class ProductQuantSpec extends SparkSpec {

  private val quant =
    """transform(embedding, x -> cast(floor(cast(x as double) /
      |  sqrt(aggregate(embedding, 0.0d,
      |    (acc, y) -> acc + cast(y as double) * cast(y as double)))
      |  * 10000.0d + 0.5d) as bigint))""".stripMargin

  test("sim_pq_topk recall vs exact integer brute force") {
    val got = ProductQuant.queries("sim_pq_topk")(spark, sf)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr(quant).as("q"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("nid"))
    val truth = e.select(col("vec_id").as("nid"), col("q").as("nv"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dist", expr(
        "aggregate(zip_with(qv, nv, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, v) -> acc + v)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size === truth.size)
    val recall = (got intersect truth).size.toDouble / truth.size
    info(s"PQ recall@5 over 10 queries: $recall")
    // 16-cell codebooks + 8% rerank budget on this corpus: measured
    // 0.82 (deterministic). PQ16 on 64 dims is the coarse end of the
    // family — the floor guards the ADC machinery, not state of the art
    assert(recall >= 0.7, s"recall $recall")
  }

  test("sim_opq_topk: learned allocation is a true permutation, recall " +
    "measured against the same brute-force truth, facade parity") {
    // the permutation itself: valid (every dim exactly once) is
    // require()d inside opqTopKOf; here pin determinism and shape
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr(quant).as("q"))
    val perm = ProductQuant.learnedPermutation(e)
    assert(perm.sorted == (0 until 64) &&
      perm == ProductQuant.learnedPermutation(e))
    val got = ProductQuant.queries("sim_opq_topk")(spark, sf)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("nid"))
    val truth = e.select(col("vec_id").as("nid"), col("q").as("nv"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dist", expr(
        "aggregate(zip_with(qv, nv, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, v) -> acc + v)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size === truth.size)
    val recall = (got intersect truth).size.toDouble / truth.size
    info(s"OPQ recall@5 over 10 queries: $recall")
    // same machinery floor as the PQ test; the PQ-vs-OPQ comparison at
    // scale is the soak's sim_opq_topk recall line
    assert(recall >= 0.7, s"recall $recall")
    // facade wires the same path
    val emb = Tables(spark, sf, "embeddings")
    val viaApi = api.Vectors.topKOpq(
      emb.filter(col("vec_id") < 10), emb, 5).collect().toSeq
    val direct = ProductQuant.queries("sim_opq_topk")(spark, sf)
      .collect().toSeq
    assert(viaApi == direct)
  }

  test("sim_pq_topk emits exactly top-5 per query, self excluded") {
    val out = ProductQuant.queries("sim_pq_topk")(spark, sf).cache()
    assert(out.count() === 50)
    assert(out.filter(col("qid") === col("nid")).count() === 0)
    val perQ = out.groupBy("qid").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(perQ === Seq(5L))
    out.unpersist()
  }
}
