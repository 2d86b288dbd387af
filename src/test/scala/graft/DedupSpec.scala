package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("dd_exact keeps one survivor per normalized text") {
    val out = Dedup.queries("dd_exact")(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_copies")).sum
    assert(total === Tables(spark, sf, "documents").count())
    assert(out.map(_.getAs[Long]("keep_id")).distinct.length === out.length)
  }

  test("minhash-LSH candidates agree with exact jaccard near-dups") {
    val mh = Dedup.queries("dd_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    val jc = Dedup.queries("dd_ngram_jaccard")(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(mh.nonEmpty, "expected planted near-duplicates")
    // high-signature-agreement pairs should be true near-dups and so
    // appear in the exact-jaccard output (estimates can differ on the
    // J≈0.5 boundary, so require strong agreement, not equality)
    val strong = Dedup.queries("dd_minhash_lsh")(spark, sf).collect()
      .filter(_.getAs[Int]("n_match") === 9)
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(strong.subsetOf(jc), s"strong minhash pairs missing: ${strong -- jc}")
  }

  test("simhash pairs are ordered, deduped, within hamming bound") {
    val rows = Dedup.queries("dd_simhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("id1") < r.getAs[Long]("id2"))
      assert(r.getAs[Int]("ham") <= 2)
    }
    val pairs = rows.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    assert(pairs.distinct.length === pairs.length)
  }

  test("embed cosine top-k returns k distinct ordered pairs") {
    val rows = Dedup.queries("dd_embed_cosine")(spark, sf).collect()
    assert(rows.length === 20)
    val pairs = rows.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    assert(pairs.distinct.length === 20)
    pairs.foreach { case (a, b) => assert(a < b) }
  }
}
