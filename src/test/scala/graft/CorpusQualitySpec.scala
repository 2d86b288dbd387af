package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusQuality

class CorpusQualitySpec extends SparkSpec {

  test("decontaminate: only training docs flagged, each with real overlap") {
    val rows = CorpusQuality.queries("dc_decontaminate")(spark, sf).collect()
    assert(rows.nonEmpty) // the corpus contains near-dups of bench docs
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 11 != 0L) // never a benchmark doc
      assert(r.getAs[Long]("n_hit_grams") > 0L)
    }
  }

  test("decontaminate: a planted benchmark copy is flagged") {
    // doc 0 is benchmark (0 % 11 == 0); any training doc with identical
    // text must surface. Build the expectation locally from raw text.
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val benchTexts = docs.collect {
      case (id, t) if id % 11 == 0 && t.split(" ").length >= 8 => t
    }.toSet
    val expectFlagged = docs.collect {
      case (id, t) if id % 11 != 0 && benchTexts.contains(t) => id
    }.toSet
    val flagged = CorpusQuality.queries("dc_decontaminate")(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(expectFlagged.subsetOf(flagged))
  }

  test("boilerplate: per-doc accounting is complete and bounded") {
    val rows = CorpusQuality.queries("dd_boilerplate")(spark, sf).collect()
    assert(rows.length === Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val units = r.getAs[Long]("n_units")
      val boiler = r.getAs[Long]("n_boiler")
      assert(units > 0L && boiler >= 0L && boiler <= units)
    }
    // total units == total ceil(words/5) over the corpus
    val expectUnits = Tables(spark, sf, "documents")
      .select(expr("cast((size(split(text, ' ')) + 4) / 5 as long)").as("u"))
      .agg(sum("u")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_units")).sum === expectUnits)
  }

  test("repetition: invariants hold and a planted doc scores exactly") {
    val rows = CorpusQuality.queries("ta_repetition")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_distinct") <= r.getAs[Int]("n_words"))
      assert(r.getAs[Int]("n_bigrams") === r.getAs[Int]("n_words") - 1
        || (r.getAs[Int]("n_words") === 1 && r.getAs[Int]("n_bigrams") === 0))
      assert(r.getAs[Int]("top_bigram_n") <= math.max(r.getAs[Int]("n_bigrams"), 1))
      assert(r.getAs[Int]("dup_word_pct") >= 0
        && r.getAs[Int]("dup_word_pct") < 100)
    }
    // local recompute for one doc pins the metric definitions
    val (docId, text) = {
      val r = Tables(spark, sf, "documents")
        .select("doc_id", "text").orderBy("doc_id").head()
      (r.getLong(0), r.getString(1))
    }
    val w = text.split(" ")
    val bg = w.sliding(2).map(_.mkString(" ")).toSeq
    val got = rows.find(_.getAs[Long]("doc_id") == docId).get
    assert(got.getAs[Int]("n_words") === w.length)
    assert(got.getAs[Int]("n_distinct") === w.distinct.length)
    assert(got.getAs[Int]("top_bigram_n") ===
      (if (bg.isEmpty) 0 else bg.groupBy(identity).map(_._2.size).max))
  }

  test("mix_domains: quotas respected, selection deterministic") {
    val q = CorpusQuality.queries("mix_domains")(spark, sf)
    val bySource = q.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, n) =>
      val quota = (src.drop(3).toInt % 3 + 1) * 10
      assert(n <= quota, s"$src over quota")
    }
    // determinism: two runs select identical rows
    val a = q.collect().map(_.toSeq).toSet
    val b = CorpusQuality.queries("mix_domains")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("vocab: contiguous ranks, descending counts, totals reconcile") {
    val rows = CorpusQuality.queries("vocab_topk")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse)
    // top-k counts can never exceed the corpus token total
    val tokens = Tables(spark, sf, "documents")
      .select(expr("size(split(text, ' '))").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(cnts.sum <= tokens)
  }

  test("dup spans: coverage matches a local interval-union recompute") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    // local reference: positional 8-grams, duplicated iff in >= 2 docs,
    // coverage = union of [p, p+7] windows over duplicated starts
    val grams = docs.toSeq.flatMap { case (id, w) =>
      if (w.length < 8) Seq.empty
      else w.sliding(8).zipWithIndex.map { case (g, p) =>
        (id, p, g.mkString(" "))
      }.toSeq
    }
    val dupSet = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
      .keySet
    val expect = grams.filter(g => dupSet.contains(g._3))
      .groupBy(_._1)
      .map { case (id, gs) =>
        id -> gs.flatMap(g => g._2 to g._2 + 7).distinct.size
      }
    val got = CorpusQuality.queries("dd_dup_spans")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_tokens"))
      .toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, n) => assert(got(id) === n.toLong, s"doc $id") }
    // coverage never exceeds the doc's word count
    CorpusQuality.queries("dd_dup_spans")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_dup_tokens") <= r.getAs[Int]("n_words").toLong)
    }
  }

  test("bpe pair counts: equals a local brute-force recompute") {
    val words = Tables(spark, sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .filter(_.length >= 2)
    val expect = words
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val got = CorpusQuality.queries("bpe_pair_counts")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cnt"))
    // query returns the global top-20 in (cnt desc, pair) order
    val expectTop = expect.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got.toSeq === expectTop)
  }

  test("mix_temperature: full local replay of the sqrt-rate hash gate") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex32(id: Long): Long = {
      md.reset()
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16)
    }
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").length.toLong))
    val tokS = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val minTok = tokS.values.min
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val rate = math.sqrt(minTok.toDouble / tokS(src).toDouble)
      val thresh = math.floor(rate * 4294967296.0).toLong
      val kept = ds.filter(d => hex32(d._1) < thresh)
      src -> ((ds.length.toLong, kept.length.toLong,
        kept.map(_._3).sum, kept.map(_._1).sum,
        math.floor(rate * 1e6).toLong))
    }
    val got = CorpusQuality.queries("mix_temperature")(spark, sf).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (nd, nk, tk, sid, ppm) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("n_kept") === nk, r.getAs[String]("source"))
      assert(r.getAs[Long]("tok_kept") === tk)
      assert(r.getAs[Long]("sum_kept_id") === sid)
      assert(r.getAs[Long]("rate_ppm") === ppm)
    }
    // the smallest source keeps everything; larger sources are sampled
    assert(got.exists(r => r.getAs[Long]("rate_ppm") === 1000000L))
    assert(got.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")))
  }

  test("bpe_encode: encodings are lossless, compressed, rank-dense") {
    val rows = CorpusQuality.queries("bpe_encode")(spark, sf).collect()
    assert(rows.length === 25)
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to 25))
    rows.foreach { r =>
      val word = r.getAs[String]("word")
      val enc = r.getAs[String]("encoded")
      // merges only ever join adjacent pieces: dropping the spaces
      // must reproduce the word byte-for-byte
      assert(enc.replace(" ", "") === word, s"lossy encode of $word")
      assert(r.getAs[Int]("n_pieces") === enc.split(" ").length)
      assert(r.getAs[Int]("n_pieces") <= word.length)
      assert(r.getAs[Long]("wf") > 0L)
    }
    // the merge table is non-trivial on this corpus: at least one of
    // the top words actually compresses below character count
    assert(rows.exists(r =>
      r.getAs[Int]("n_pieces") < r.getAs[String]("word").length))
  }

  test("dataset card: rollup levels reconcile and dup count matches dd_exact") {
    import graft.operators.{CorpusQuality, Dedup}
    val card = CorpusQuality.queries("tr_dataset_card")(spark, sf).collect()
    val total = card.filter(r => r.getString(0) == "ALL").toSeq
    assert(total.size === 1)
    val perSource = card.filter(r =>
      r.getString(0) != "ALL" && r.getString(1) == "ALL")
    val perPair = card.filter(r =>
      r.getString(0) != "ALL" && r.getString(1) != "ALL")
    // each aggregate column sums exactly across grouping levels
    for (c <- Seq("n_docs", "n_tokens", "n_chars", "n_dup_docs")) {
      val t = total.head.getAs[Long](c)
      assert(perSource.map(_.getAs[Long](c)).sum === t, c)
      assert(perPair.map(_.getAs[Long](c)).sum === t, c)
    }
    // the card's corpus-wide dup count is dd_exact's duplicate volume:
    // every member of a >1-copy digest group counts as a dup doc
    val dupFromDedup = Dedup.queries("dd_exact")(spark, sf)
      .filter(col("n_copies") > 1)
      .agg(coalesce(sum("n_copies"), lit(0L))).collect().head.getLong(0)
    assert(total.head.getAs[Long]("n_dup_docs") === dupFromDedup)
  }

  test("dc_fuzzy_decontaminate: planted paraphrase pair, exact jaccard") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    // doc 0 (0 % 11 = 0) is the benchmark doc: 10 words → 3 distinct
    // 8-grams; doc 1 appends one word → 4 grams sharing all 3 →
    // jaccard 3/4 = 750 ‰, contaminated; doc 2 shares nothing
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    Seq((0L, base), (1L, base + " w11"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.CorpusQuality
      .queries("dc_fuzzy_decontaminate")(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(r.fieldIndex("train_id")) === 1L)
    assert(r.getLong(r.fieldIndex("bench_id")) === 0L)
    assert(r.getLong(r.fieldIndex("inter")) === 3L)
    assert(r.getLong(r.fieldIndex("jac_pm")) === 750L)
    assert(r.getInt(r.fieldIndex("contaminated")) === 1)
  }
}
