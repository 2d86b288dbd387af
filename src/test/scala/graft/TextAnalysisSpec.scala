package graft

import org.apache.spark.sql.functions.{col, length, lit}
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("lang id covers every doc with a prediction") {
    val rows = TextAnalysis.queries("ta_lang_id")(spark, sf).collect()
    assert(rows.length === Tables(spark, sf, "documents").count())
    val preds = rows.map(_.getAs[String]("pred_lang")).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("quality buckets are exhaustive and counts are consistent") {
    val rows = TextAnalysis.queries("ta_quality_score")(spark, sf).collect()
    rows.foreach { r =>
      assert(Set("good", "fair", "poor").contains(r.getAs[String]("quality")))
      assert(r.getAs[Int]("n_chars") >= r.getAs[Int]("n_punct"))
      assert(r.getAs[Int]("n_tokens") >= r.getAs[Long]("n_stop"))
    }
  }

  test("token counts ordering: regex tokens >= whitespace tokens") {
    val rows = TextAnalysis.queries("ta_token_count")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("re_tokens") >= r.getAs[Int]("ws_tokens") - 1)
    }
  }

  test("fingerprints: equal texts share fp; winnow_min is a valid md5") {
    val rows = TextAnalysis.queries("ta_fingerprint")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("fp").length === 16)
      assert(r.getAs[String]("winnow_min").matches("[0-9a-f]{32}"))
    }
  }

  test("unigram LM: dense ranks, and ranked docs exist in the corpus") {
    val rows = TextAnalysis.queries("ta_unigram_lm")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to 10))
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.size === 10)
    val n = Tables(spark, sf, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*)).count()
    assert(n === 10)
  }

  test("reservoir sample: exactly K per stratum, stable across runs") {
    val k = 5
    val a = TextAnalysis.queries("samp_reservoir")(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
    val b = TextAnalysis.queries("samp_reservoir")(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
    assert(a.toSeq === b.toSeq, "selection must be run-stable")
    val perLang = a.groupBy(_._1).view.mapValues(_.length)
    val langSizes = Tables(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(n === math.min(k.toLong, langSizes(lang)), s"lang $lang")
    }
  }

  test("bm25: dense ranks 1..10 and every hit contains a query term") {
    val rows = TextAnalysis.queries("ts_bm25")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to 10))
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.size === 10)
    val terms = Set("spark", "window", "merge", "stream")
    val texts = Tables(spark, sf, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("text").collect().map(_.getString(0))
    assert(texts.forall(t => t.split(" ").exists(terms)))
  }

  test("quality classifier: local feature/score replay, both classes") {
    val texts = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.queries("ta_quality_classifier")(spark, sf)
      .collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val toks = t.split(" ")
      val score = 4L * toks.length + 50L * toks.distinct.length +
        10L * toks.count(w => w == "the" || w == "a") - t.length - 1180L
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_uniq") === toks.distinct.length.toLong)
      assert(r.getAs[Long]("n_chars") === t.length.toLong)
      assert(r.getAs[Long]("score") === score)
      assert(r.getAs[Int]("keep") === (if (score >= 0) 1 else 0))
    }
    // the model actually separates this corpus
    assert(rows.exists(_.getAs[Int]("keep") == 1))
    assert(rows.exists(_.getAs[Int]("keep") == 0))
  }

  test("confusion matrix partitions the corpus across both label planes") {
    val cells = TextAnalysis.queries("ml_confusion")(spark, sf).collect()
      .map(r => (r.getAs[Int]("keep"), r.getAs[String]("quality"),
        r.getAs[Long]("n")))
    val total = Tables(spark, sf, "documents").count()
    assert(cells.map(_._3).sum === total)
    assert(cells.forall(_._3 > 0))
    assert(cells.map(_._1).distinct.sorted.toSeq === Seq(0, 1))
  }

  test("linreg: closed form over exact local sums, r2 in (0,1]") {
    val pts = Tables(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) ->
        (r.getString(1).split(" ").length.toLong, r.getString(1).length.toLong))
    val got = TextAnalysis.queries("ml_linreg")(spark, sf).collect()
    got.foreach { r =>
      val ps = pts.filter(_._1 == r.getString(0)).map(_._2)
      val n = ps.length.toDouble
      val (sx, sy) = (ps.map(_._1).sum.toDouble, ps.map(_._2).sum.toDouble)
      val sxx = ps.map(p => p._1 * p._1).sum.toDouble
      val syy = ps.map(p => p._2 * p._2).sum.toDouble
      val sxy = ps.map(p => p._1 * p._2).sum.toDouble
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      assert(r.getAs[Double]("slope") === cov / vx)
      assert(r.getAs[Double]("intercept") === (sy - (cov / vx) * sx) / n)
      val r2 = r.getAs[Double]("r2")
      assert(r2 === (cov * cov) / (vx * (n * syy - sy * sy)))
      assert(r2 > 0.0 && r2 <= 1.0)
      // chars grow with tokens: a positive, word-length-scale slope
      assert(r.getAs[Double]("slope") > 1.0)
    }
  }

  test("phrase search: local replay of top-trigram adjacency matches") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val triCounts = docs.flatMap { case (_, w) =>
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")) else Iterator.empty
    }.groupBy(identity).map { case (p, xs) => p -> xs.length }
    val top = triCounts.toSeq.sortBy { case (p, c) => (-c, p) }.head._1
    val expected = docs.flatMap { case (id, w) =>
      val n = if (w.length >= 3)
        w.sliding(3).count(_.mkString(" ") == top) else 0
      if (n > 0) Some((id, top, n.toLong)) else None
    }.toSet
    val got = TextAnalysis.queries("ts_phrase_search")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase"),
        r.getAs[Long]("n_occ"))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("outlier rule: local median/MAD replay flags exactly dev > 3*MAD") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").length))
    def medianBy[K](xs: Seq[(Int, Long)]): Int = {
      // value at position (n+1)/2 under (value, doc_id) — the
      // operator's explicit positional rule
      val sorted = xs.sortBy(x => (x._1, x._2))
      sorted((sorted.length + 1) / 2 - 1)._1
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val med = medianBy(ds.toSeq.map(d => (d._3, d._1)))
      val devs = ds.map(d => (d._1, math.abs(d._3 - med)))
      val mad = medianBy(devs.toSeq.map(d => (d._2, d._1)))
      devs.filter(_._2 > 3 * mad).map(d => (d._1, src, med, mad))
    }.toSet
    val got = TextAnalysis.queries("ta_outliers")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("med"), r.getAs[Int]("mad"))).toSet
    assert(got === expected)
    assert(got.nonEmpty) // the rule fires on this corpus
  }

  test("tc_normalize: canonicalization round-trips the messy rendering") {
    val got = TextAnalysis.queries("tc_normalize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getBoolean(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length === docs.size)
    // the corpus is pure [a-z0-9 ] single-spaced, so normalization of
    // the shouting/punctuated rendering must restore it exactly
    assert(got.forall(_._4))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got.take(25).foreach { case (id, len, h, _) =>
      assert(len === docs(id).length)
      assert(h === md5hex(docs(id)))
    }
  }

  test("dq_drift_report equals a local token-count replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = scala.collection.mutable.Map
      .empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    for ((id, text) <- docs; t <- text.split(" ", -1)) {
      val (a, b) = counts(t)
      counts(t) = if (id % 2 == 0) (a + 1, b) else (a, b + 1)
    }
    val want = counts.toSeq
      .map { case (t, (a, b)) => (t, a, b, b - a) }
      .sortBy { case (t, _, _, d) => (-math.abs(d), t) }
      .take(15)
    val got = TextAnalysis.queries("dq_drift_report")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
  }

  test("samp_weighted equals a local integer A-ES recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def prio(id: Long, w: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) / w
    }
    val want = docs.map { case (id, w) => (prio(id, w), id, w) }
      .sortBy(t => (t._1, t._2)).take(20).zipWithIndex
      .map { case ((p, id, w), i) => (i + 1, id, w, p) }.toSeq
    val got = TextAnalysis.queries("samp_weighted")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    // weight bias is real: the sample's mean n_chars exceeds the
    // corpus mean (long docs win more often under u div w)
    val sampleMean = got.map(_._3).sum.toDouble / got.size
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean)
  }

  test("ta_code_detect equals a local symbol-density recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val note = if (id % 3 == 0)
        s"$text def fn$id(x): { return x * $id; }" else text
      val nSym = note.count("(){};:*=".contains(_))
      val nTok = note.split(" ", -1).length
      (id, nSym, nTok, nSym * 25 >= nTok)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.queries("ta_code_detect")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .toSeq
    assert(got === want)
    // both classes present: the synthesized third trips the detector,
    // pure word-salad does not
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("bigram LM: local replay ranks the off-distribution doc most surprising") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bigram").toString
    // docs 1-3 share the corpus's dominant bigrams; doc 4 is one rare
    // transition after another → lowest avg log-prob
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "the dog sat on the mat"),
      (4L, "zig zag zog zug zeg zip"))
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("ta_bigram_lm")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._1).toSeq === (1 to 4))
    assert(got.head._2 === 4L) // rank 1 = most surprising
    // full local replay of the smoothed score
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val bigs = toks.map { case (id, w) => id -> w.zip(w.tail) }
    val c12 = bigs.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.toSeq.groupBy(_._1._1)
      .map { case (k, v) => k -> v.map(_._2).sum }
    val v = toks.flatMap(_._2).distinct.size.toLong
    val want = bigs.map { case (id, bs) =>
      val byPair = bs.groupBy(identity)
        .map { case (k, g) => (k, g.size) }.toSeq.sortBy(_._1)
      val lp = byPair.foldLeft(0.0) { case (acc, ((w1, w2), tf)) =>
        acc + tf * math.log((c12((w1, w2)) + 1).toDouble /
          (c1(w1) + v).toDouble)
      }
      id -> lp / bs.size
    }.sortBy { case (id, s) => (s, id) }.map(_._1)
    assert(got.map(_._2).toSeq === want)
  }

  test("ts_hybrid_fusion: Borda scores are bounded, ranks dense, and " +
      "a doc topping BOTH rankers tops the fusion") {
    val fused = TextAnalysis.queries("ts_hybrid_fusion")(spark, sf)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("borda")))
    assert(fused.nonEmpty && fused.length <= 10)
    assert(fused.map(_._1).toSeq === (1 to fused.length))
    // two depth-20 rankers: max possible score is 20 + 20
    assert(fused.forall(t => t._3 >= 1 && t._3 <= 40))
    // scores are non-increasing in rank
    assert(fused.map(_._3).toSeq === fused.map(_._3).sortBy(-_).toSeq)
    // the BM25 winner carries 20 points, so it must appear in the
    // fused top-10 (max competitor score is 40, min winner score 20,
    // and ties can't push 10 docs above it: at most 9 docs can strictly
    // exceed 20+19... keep the weak form: membership)
    val bm25Top = TextAnalysis.queries("ts_bm25")(spark, sf)
      .collect().head.getAs[Long]("doc_id")
    assert(fused.map(_._2).contains(bm25Top))
  }

  test("ts_proximity: bucketed pair counts equal the brute position " +
      "join for the corpus's top-2 terms") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, v) => w -> v.length }
    val Seq(t1, t2) = freq.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(2).map(_._1)
    val want = docs.flatMap { case (id, ws) =>
      val pa = ws.zipWithIndex.collect { case (`t1`, i) => i.toLong }
      val pb = ws.zipWithIndex.collect { case (`t2`, i) => i.toLong }
      val pairs = for (a <- pa; b <- pb if math.abs(a - b) <= 3)
        yield math.abs(a - b)
      if (pairs.isEmpty) None
      else Some(id -> (pairs.length.toLong, pairs.min))
    }.toMap
    val got = TextAnalysis.queries("ts_proximity")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("ta_readability: hand-counted Flesch–Kincaid components") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fk").toString
    // "Hello world. It is big!" → words 5, sentence runs 2 ('.' '!'),
    // vowel groups: e,o | o | I | i | i → 6 syllables
    // fk_x100 = (39·5)//2 + (1180·6)//5 − 1559 = 97 + 1416 − 1559 = −46
    Seq((1L, "Hello world. It is big!"), (2L, "no punctuation here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("ta_readability")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getLong(r1.fieldIndex("words")) === 5L)
    assert(r1.getLong(r1.fieldIndex("sentences")) === 2L)
    assert(r1.getLong(r1.fieldIndex("syllables")) === 6L)
    assert(r1.getLong(r1.fieldIndex("fk_x100")) === -46L)
    assert(r1.getString(r1.fieldIndex("band")) === "easy")
    // a text with no terminal punctuation clamps to one sentence
    val r2 = got(2L)
    assert(r2.getLong(r2.fieldIndex("sentences")) === 1L)
  }
}
