package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Property tests for the blocking-completeness and packing/chunking
  * contracts, against local reference implementations on random
  * inputs. Blocking bugs are SILENT at scale — a missed candidate pair
  * is just a duplicate that survives — so the PassJoin completeness
  * property in particular runs over vocabularies engineered to hit the
  * edges: lengths 1..24 (straddling the short-pool boundary), repeated
  * substrings, and near-identical families.
  */
class CorpusPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("passjoin finds EVERY pair within distance 3 on random vocabularies") {
    import spark.implicits._
    // small alphabet + short lengths maximize both true pairs and
    // segment-collision edge cases (empty-ish segments, repeated chars)
    val word = for {
      n <- Gen.chooseNum(1, 24)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    for (round <- 0 until 3) {
      val vocab = samples(word, 120, 1000L * round).distinct
      val truth = (for {
        a <- vocab; b <- vocab if a < b
        d = levDist(a, b) if d <= 3
      } yield (a, b, d)).sortBy(t => (t._1, t._2))
      val dir = java.nio.file.Files.createTempDirectory(s"pj_prop$round")
        .toString
      vocab.toDF("p_name").write.mode("overwrite")
        .parquet(s"$dir/part.parquet")
      val got = operators.FuzzyJoin.queries("dd_fuzzy_passjoin")(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
        .toSeq
      assert(got === truth,
        s"round $round: vocab size ${vocab.size}, " +
          s"missing ${(truth.toSet -- got.toSet).take(5)}, " +
          s"spurious ${(got.toSet -- truth.toSet).take(5)}")
    }
  }

  test("doc_chunk equals a local sliding-window reference on random docs") {
    import spark.implicits._
    val doc = for {
      n <- Gen.chooseNum(1, 200)
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield ws.mkString(" ")
    val docs = samples(doc, 60, 7L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val dir = java.nio.file.Files.createTempDirectory("ck_prop").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = operators.CorpusPrep.queries("doc_chunk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    val want = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      // 1 + ceil((n-W)/S) windows: stop once a window reaches the last
      // token — a further stride would be fully inside the previous one
      val hi = math.max(0, (toks.length - 64 + 47) / 48)
      (0 to hi)
        .map(i => (i, toks.slice(i * 48, i * 48 + 64)))
        .filter(_._2.nonEmpty)
        .map { case (i, slice) =>
          (id, i, slice.length, slice.mkString(" ")) }
    }.sortBy(t => (t._1, t._2))
    assert(got === want)
  }

  test("pack_sequences matches a local per-group FFD cumsum reference") {
    import spark.implicits._
    val doc = for {
      n <- Gen.chooseNum(1, 300)
      ws <- Gen.listOfN(n, Gen.const("w"))
    } yield ws.mkString(" ")
    val docs = samples(doc, 80, 11L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val dir = java.nio.file.Files.createTempDirectory("pk_prop").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = operators.CorpusPrep.queries("pack_sequences")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val want = docs
      .map { case (id, t) => (id, t.split(" ").length.toLong) }
      .groupBy { case (id, _) => (id % 32).toInt }
      .toSeq.flatMap { case (grp, members) =>
        val ordered = members.sortBy { case (id, n) => (-n, id) }
        val cums = ordered.scanLeft(0L) { case (acc, (_, n)) => acc + n }
        ordered.zip(cums).map { case ((id, n), before) =>
          (grp, (before / 512).toInt, id, n) }
          .groupBy { case (g, bin, _, _) => (g, bin) }
          .toSeq.map { case ((g, bin), rows) =>
            (g, bin, rows.size.toLong, rows.map(_._4).sum,
              rows.map(_._3).min, rows.map(_._3).max) }
      }.sortBy(t => (t._1, t._2))
    assert(got === want)
  }

  // independent md5-hex of a string's UTF-8 bytes, for the native
  // expression cross-checks below (test-side implementation: java
  // digest + format, no shared code with the expressions)
  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  test("MinHash9 expression equals a local recompute on random docs") {
    import spark.implicits._
    graft.functions.MinHash9.register(spark)
    // tokens include empty strings, unicode, and repeats — the edges a
    // hex/byte conversion bug would hide in
    val token = Gen.oneOf(
      Gen.const(""), Gen.const("päö"), Gen.const("→x"),
      Gen.listOfN(3, Gen.oneOf('a', 'b')).map(_.mkString),
      Gen.alphaNumStr.map(_.take(6)))
    val doc = for {
      n <- Gen.chooseNum(0, 12)
      ts <- Gen.listOfN(n, token)
    } yield ts
    val docs = samples(doc, 120, 4242L).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
    val got = docs.toDF("doc_id", "toks")
      .selectExpr("doc_id", "minhash9(toks) AS mh")
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[String](1)).map(_.toSeq)).toMap
    docs.foreach { case (id, ts) =>
      val want =
        if (ts.length < 3) None
        else {
          val grams = ts.sliding(3).map(_.mkString(" ")).toSeq.distinct
          Some((1 to 9).map(k =>
            grams.map(g => md5hex(s"$k|$g")).min))
        }
      assert(got(id) === want, s"doc $id toks=$ts")
    }
  }

  test("SimHash63 expression equals a local recompute on random docs") {
    import spark.implicits._
    graft.functions.SimHash63.register(spark)
    val token = Gen.oneOf(
      Gen.const(""), Gen.const("日本"), Gen.const("café"),
      Gen.listOfN(2, Gen.oneOf('x', 'y', 'z')).map(_.mkString))
    val doc = for {
      n <- Gen.chooseNum(0, 10)
      ts <- Gen.listOfN(n, token)
    } yield ts
    val docs = samples(doc, 120, 777L).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
    val got = docs.toDF("doc_id", "toks")
      .selectExpr("doc_id", "simhash63(toks) AS sig")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, ts) =>
      val counts = new Array[Int](63)
      ts.foreach { w =>
        val h = md5hex(w)
        for (b <- 0 until 63) {
          val digit = Integer.parseInt(h(b / 4).toString, 16)
          if (((digit >> (b % 4)) & 1) == 1) counts(b) += 1
        }
      }
      var want = 0L
      for (b <- 0 until 63)
        if (2 * counts(b) > ts.length) want |= 1L << b
      assert(got(id) === want, s"doc $id toks=$ts")
    }
  }
}
