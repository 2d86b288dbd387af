package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  test("vec_dot matches the interpreted higher-order formulation exactly") {
    VectorFunctions.register(spark)
    val e = Tables(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding").as("v"))
    val both = e.withColumn("fast", expr("vec_dot(v, v)"))
      .withColumn("slow", expr(
        "aggregate(zip_with(transform(v, x -> cast(x as double)), " +
          "transform(v, x -> cast(x as double)), (x, y) -> x * y), " +
          "0D, (a, x) -> a + x)"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[Double]("fast") === r.getAs[Double]("slow"))
    }
  }

  test("brute-force top-k: 5 neighbors per query, self excluded") {
    val rows = Similarity.queries("sim_bruteforce_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5)
      assert(!rs.map(_.getAs[Long]("nid")).contains(q))
    }
  }

  test("IVF recall vs brute force is high") {
    def pairs(name: String) =
      Similarity.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val brute = pairs("sim_bruteforce_topk")
    val ivf = pairs("sim_ivf_topk")
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.7, s"IVF recall $recall too low")
  }

  test("SQ8 rerank recall vs brute force is near-exact") {
    def pairs(name: String) =
      Similarity.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val brute = pairs("sim_bruteforce_topk")
    val sq = pairs("sim_sq_topk")
    // 50 int8-dot candidates out of ~500 vectors, exact rerank: the
    // only loss is a true neighbor falling outside the candidate set
    val recall = (brute & sq).size.toDouble / brute.size
    assert(recall >= 0.9, s"SQ8 recall $recall too low")
    assert(sq.groupBy(_._1).forall(_._2.size == 5))
  }

  test("hash featurizer: counts reconcile and norm is exact") {
    val rows = Similarity.queries("emb_hash_features")(spark, sf).collect()
    val tokenCounts = Tables(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length === tokenCounts.size)
    rows.foreach { r =>
      val vec = r.getAs[String]("fvec").split(",").map(_.toLong)
      assert(vec.length === 16)
      // bucket counts partition the doc's tokens
      assert(vec.sum === tokenCounts(r.getAs[Long]("doc_id")).toLong)
      // squared norm matches the rendered vector exactly
      assert(vec.map(c => c * c).sum === r.getAs[Long]("sq_norm"))
    }
  }

  test("hard negatives: exact local replay of both heads") {
    // same arithmetic as FloatVecDot: double accumulation in index order
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val embs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val norm = embs.map { case (id, v, _) => id -> math.sqrt(dot(v, v)) }
      .toMap
    val byId = embs.map(e => e._1 -> e).toMap
    val rows = Similarity.queries("ml_hard_negatives")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 10)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq === (0 to 5))
      val (_, qv, qlbl) = byId(qid)
      def cos(nid: Long): Double =
        dot(qv, byId(nid)._2) / (norm(qid) * norm(nid))
      val ranked = embs.filter(_._1 != qid)
        .map { case (nid, _, lbl) => (nid, lbl, cos(nid)) }
      val expectPos = ranked.filter(_._2 == qlbl)
        .sortBy { case (nid, _, c) => (-c, nid) }.head._1
      val expectNegs = ranked.filter(_._2 != qlbl)
        .sortBy { case (nid, _, c) => (-c, nid) }.take(5).map(_._1).toSeq
      val pos = rs.find(_.getAs[Int]("rn") == 0).get.getAs[Long]("nid")
      val negs = rs.filter(_.getAs[Int]("rn") > 0)
        .sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("nid")).toSeq
      assert(pos === expectPos, s"anchor $qid positive")
      assert(negs === expectNegs, s"anchor $qid negatives")
    }
  }

  test("kNN probe: local vote replay, accuracy beats chance") {
    val all = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map { r =>
        (r.getLong(0),
          r.getSeq[Float](1).map(x =>
            math.floor(x.toDouble * 1000.0 + 0.5).toLong).toArray,
          r.getInt(2))
      }
    def qdot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = all.filter(_._1 < 200).map { case (qid, qv, tl) =>
      val nn = all.filter(_._1 != qid)
        .map { case (nid, nv, nl) => (nid, nl, qdot(nv, qv)) }
        .sortBy { case (nid, _, rel) => (-rel, nid) }.take(5)
      val pred = nn.groupBy(_._2).toSeq
        .map { case (l, xs) => (xs.length, l) }
        .sortBy { case (v, l) => (-v, l) }.head._2
      (qid, tl, pred)
    }
    val byLabel = expected.groupBy(_._2).map { case (l, xs) =>
      l -> (xs.length.toLong, xs.count(x => x._3 == x._2).toLong)
    }
    val got = Similarity.queries("ml_knn_probe")(spark, sf).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_probes"), r.getAs[Long]("n_correct"))).toMap
    assert(got === byLabel)
    val (n, c) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    val nLabels = all.map(_._3).distinct.length
    assert(c.toDouble / n > 1.0 / nLabels,
      s"accuracy ${c.toDouble / n} not above chance")
  }

  test("MMR: local greedy replay over quantized dots, pick 1 is top-1") {
    val quant = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong).toArray
      }.toMap
    def qdot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val got = Similarity.queries("sim_mmr_topk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
    assert(got.size === 10)
    got.foreach { case (qid, rows) =>
      val qv = quant(qid)
      val cands = quant.toSeq.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, nv, qdot(nv, qv)) }
        .sortBy { case (nid, _, rel) => (-rel, nid) }.take(20)
      var sel = List(cands.head)               // round 1: argmax rel
      for (r <- 2 to 5) {
        val rest = cands.filterNot(c => sel.exists(_._1 == c._1))
        val next = rest.map { c =>
          val ms = sel.map(s => qdot(c._2, s._2)).max
          (c, c._3 - ms)
        }.minBy { case (c, score) => (-score, c._1) }._1
        sel = sel :+ next
      }
      val want = sel.map(_._1)
      val gotOrder = rows.sortBy(_.getAs[Int]("pick"))
        .map(_.getAs[Long]("nid")).toSeq
      assert(gotOrder === want, s"query $qid greedy order")
      // pick 1 must be the plain nearest neighbor by quantized dot
      assert(gotOrder.head === cands.head._1)
    }
  }

  test("matryoshka two-stage: high full-dim recall, exact within shortlist") {
    import org.apache.spark.sql.functions._
    val brute = Similarity.queries("sim_bruteforce_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mat = Similarity.queries("sim_matryoshka")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mat.map(_._1).distinct.sorted === brute.map(_._1).distinct.sorted)
    // These embeddings are RANDOM (no MRL training), so an 8-of-64-dim
    // prefix carries only 1/8 of the signal — the bound here is that
    // the shortlist is a real signal, several times better than a
    // random 50-of-500 shortlist's ~10% expected recall. (With
    // MRL-trained vectors the prefix is constructed to concentrate
    // the signal and recall approaches 1; that property belongs to
    // the model, not the operator.)
    val recall = mat.toSet.intersect(brute.toSet).size.toDouble /
      brute.length
    assert(recall >= 0.25, s"recall $recall")
    // stage 2 is EXACT within its shortlist: every returned neighbor
    // the brute top-5 also contains must appear at the same rank
    val byQ = mat.groupBy(_._1)
    val bruteByQ = brute.groupBy(_._1)
    byQ.foreach { case (q, got) =>
      val wantOrder = bruteByQ(q).map(_._2)
        .filter(n => got.exists(_._2 == n))
      assert(got.map(_._2).filter(wantOrder.contains).toSeq
        === wantOrder.toSeq, s"query $q rerank order")
    }
  }

  test("sim_eval_mrr grades the brute top-5 against labels with exact " +
      "fixed-point reciprocal ranks") {
    val rows = Similarity.queries("sim_eval_mrr")(spark, sf).collect()
    assert(rows.length === 10)
    val legalRr = Set(0L, 12L, 15L, 20L, 30L, 60L)
    rows.foreach { r =>
      val rank = r.getAs[Long]("first_rel_rank")
      val rr = r.getAs[Long]("rr_x60")
      val rel = r.getAs[Long]("rel_at_5")
      assert(rank >= 0 && rank <= 5)
      assert(legalRr.contains(rr), s"rr $rr")
      // rr is 60/rank exactly, and a relevant hit exists iff rank > 0
      if (rank > 0) assert(rr === 60 / rank && rel >= 1)
      else assert(rr === 0 && rel === 0)
      assert(rel <= 5)
    }
    // cross-check one query against a local replay: the first
    // same-label position in the brute list IS first_rel_rank
    val lab = Tables(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val brute = Similarity.queries("sim_bruteforce_topk")(spark, sf)
      .collect().map(r =>
        (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
    val want = brute.groupBy(_._1).map { case (q, ns) =>
      q -> (ns.map(_._2).indexWhere(n => lab(n) == lab(q)) + 1)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("first_rel_rank") ===
        want(r.getAs[Long]("qid")).toLong)
    }
  }
}
