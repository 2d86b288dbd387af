package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, Similarity}

class IvfPqSpec extends SparkSpec {

  test("IVF-PQ recall against exact brute force at probes=4/16") {
    val got = IvfPq.queries("sim_ivfpq_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.queries("sim_bruteforce_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (got & exact).size.toDouble / exact.size
    // probes=4 of 16 cells bounds recall below 1.0 by construction on
    // hard queries; at sf0.001 the measured floor is well above chance
    assert(recall >= 0.5, f"recall $recall%.2f")
    // every query returns exactly k rows
    val perQ = got.groupBy(_._1).map(_._2.size)
    assert(perQ.forall(_ == 5))
  }

  test("ADC candidates come only from the query's probed cells") {
    // recompute the coarse assignment + probe lists locally and check
    // the returned neighbors' cells are all probed by their query
    val e = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(x =>
          math.floor(x / n * 10000.0 + 0.5).toLong).toArray
      }.toMap
    val coarse = e.toSeq.sortBy(_._1).take(16).zipWithIndex
      .map { case ((_, q), i) => i.toLong -> q }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cellOf(q: Array[Long]): Long =
      coarse.map { case (c, cq) => (d2(q, cq), c) }.min._2
    def probesOf(q: Array[Long]): Set[Long] =
      coarse.map { case (c, cq) => (d2(q, cq), c) }.sorted.take(4)
        .map(_._2).toSet
    IvfPq.queries("sim_ivfpq_topk")(spark, sf).collect().foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(1))
      assert(probesOf(e(qid)).contains(cellOf(e(nid))),
        s"neighbor $nid of query $qid from an unprobed cell")
    }
  }

  test("adaptive rerank: per-query rows equal the chosen budget's " +
    "fixed-policy rows, and degenerate margins collapse to the fixed " +
    "policies") {
    def emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    def fixedRows(rr: Int): Map[Long, Set[(Long, Long)]] =
      IvfPq.ivfPqTopKOf(emb.filter(col("vec_id") < 10), emb, 5, 4, rr)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val f40 = fixedRows(40)
    val f160 = fixedRows(160)
    val ad = IvfPq.queries("sim_adaptive_rerank")(spark, sf).collect()
    val budgets = ad.map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(budgets.nonEmpty)
    assert(budgets.values.forall(b => b == 40L || b == 160L))
    // COMPOSITION LAW: an escalated query's result is exactly the
    // fixed-160 search's, a non-escalated one's exactly the fixed-40's
    // — the adaptive policy routes between the two, never invents rows
    budgets.foreach { case (q, b) =>
      val got = ad.filter(_.getLong(0) == q)
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      val want = if (b == 160L) f160(q) else f40(q)
      assert(got === want, s"query $q at budget $b")
    }
    // degenerate margins: an always-true margin escalates every query
    // (= fixed-160); a zero margin escalates only on an exact ADC tie
    // between the k-th and cut candidates
    def adaptive(num: Int, den: Int): Array[org.apache.spark.sql.Row] =
      IvfPq.adaptiveRerankTopKOf(emb.filter(col("vec_id") < 10), emb,
        5, 4, 40, 160, num, den).collect()
    val allEsc = adaptive(1000000, 1)
    assert(allEsc.forall(_.getLong(3) == 160L))
    val allRows = allEsc.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(allRows === f160)
    val zeroMargin = adaptive(0, 1)
    // with margin 0 a query escalates only when a_cut == a_k exactly;
    // budgets are still drawn from the two policies
    assert(zeroMargin.forall(r =>
      r.getLong(3) == 40L || r.getLong(3) == 160L))
  }

  test("sim_index_add: every batch vector encodes to M in-range codes " +
    "against the frozen base-trained artifacts, deterministically") {
    val out = IvfPq.queries("sim_index_add")(spark, sf).collect()
    assert(out.nonEmpty)
    // exactly the vec_id ≡ 7 (mod 10) batch, nothing from the base
    assert(out.forall(_.getLong(0) % 10 == 7))
    val expected = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 === 7).count()
    assert(out.length.toLong === expected)
    // one coarse cell in [0, C), M codes each in [0, CB)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    assert(out.forall { r =>
      val cs = r.getString(2).split(",")
      cs.length == 8 && cs.forall(c => c.toInt >= 0 && c.toInt < 16)
    })
    // a second run reads the persisted artifacts and is bit-identical
    val again = IvfPq.queries("sim_index_add")(spark, sf).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
