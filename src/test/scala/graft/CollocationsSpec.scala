package graft

import org.apache.spark.sql.functions._
import graft.operators.{Collocations, DataQuality, Multimodal}

class CollocationsSpec extends SparkSpec {

  test("ts_keywords: scores rank tf/df exactly; every doc gets <= 3") {
    val out = Collocations.queries("ts_keywords")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq === (1 to rows.length))
      // scores non-increasing in rank order
      val byRank = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ta_pmi_pairs: every pair is a real adjacent bigram with exact counts") {
    val out = Collocations.queries("ta_pmi_pairs")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 50)
    // recompute corpus stats driver-side
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ").toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val big = docs.flatMap(w => w.zip(w.tail))
      .groupBy(identity).view.mapValues(_.size).toMap
    val t = docs.map(_.size).sum
    out.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === big((w1, w2)).toLong)
      assert(r.getLong(3) === uni(w1).toLong)
      assert(r.getLong(4) === uni(w2).toLong)
      assert(r.getLong(5) ===
        r.getLong(2) * t * 1000L / (r.getLong(3) * r.getLong(4)))
    }
  }

  test("dq_benford: all nine digits, counts sum to orders, pm sums ~1000") {
    val out = DataQuality.queries("dq_benford")(spark, sf).collect()
    assert(out.map(_.getInt(0)).sorted.toSeq === (1 to 9))
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(out.map(_.getLong(1)).sum === nOrders)
    out.foreach(r => assert(r.getLong(2) === nOrders))
    val pmSum = out.map(_.getLong(3)).sum
    assert(pmSum >= 990 && pmSum <= 1000) // floor-division slack
  }

  test("mm_phash_near: pattern geometry gives cross-class distance > 2 " +
      "and the pigeonhole join loses no pair") {
    // exhaustively verify the DESIGN CLAIM the oracle leans on: for
    // every one of the 128 (p, f) classes (plus base variation),
    // aHash distance is 0 within a class, exactly 2 within a pattern,
    // > 2 (in fact >= 6) across patterns — over the real codec
    // round-trip
    import spark.implicits._
    val reps = (0L until 256L).toDS() // 2 reps per class, bases differ
      .map(id => Multimodal.NearSpec(id, (id % 16).toInt,
        (id / 16 % 8).toInt, (id % 56).toInt))
    val hashes = reps.mapPartitions(Multimodal.encodeNear _)
      .mapPartitions(Multimodal.avgHashBits _)
      .collect().map(p => p.doc_id -> p.bits).toMap
    for (a <- 0L until 256L; b <- a + 1 until 256L) {
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if (a % 16 == b % 16 && a / 16 % 8 == b / 16 % 8)
        assert(d === 0, s"$a,$b d=$d")
      else if (a % 16 == b % 16) assert(d === 2, s"$a,$b d=$d")
      else assert(d >= 6, s"$a,$b d=$d")
    }
    // end-to-end: the banded join returns exactly the same-pattern pairs
    val out = Multimodal.queries("mm_phash_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val want = (for {
      a <- ids; b <- ids if a < b && a % 16 == b % 16
    } yield (a, b, if (a / 16 % 8 == b / 16 % 8) 0L else 2L)).toSet
    assert(out.toSet === want)
  }
}
