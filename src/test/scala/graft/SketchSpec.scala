package graft

import org.apache.spark.sql.functions._
import graft.functions.CardSketch
import graft.operators.Sketch

class SketchSpec extends SparkSpec {

  test("sketch estimate within 2.3σ of exact distinct count (m=64)") {
    CardSketch.register(spark)
    // sf0.01: n≈1400 >> m, the raw-HLL regime (sf0.001's n=150 sits in
    // the noisy linear-counting crossover for a 64-register sketch)
    val row = Tables(spark, "/root/testdata/sf0.01", "orders")
      .agg(expr("card_sketch(cast(o_custkey as string))").as("registers"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect().head
    val est = CardSketch.estimate(row.getAs[String]("registers"))
    val exact = row.getAs[Long]("exact").toDouble
    // σ ≈ 1.04/√64 = 13%; 2.3σ = 30%
    val err = math.abs(est - exact) / exact
    assert(err < 0.3, s"estimate $est vs exact $exact (err $err)")
  }

  test("sketch is insensitive to duplication and partitioning") {
    CardSketch.register(spark)
    def regs(df: org.apache.spark.sql.DataFrame): String = df
      .agg(expr("card_sketch(cast(o_custkey as string))").as("r"))
      .collect().head.getAs[String]("r")
    val o = Tables(spark, sf, "orders")
    val base = regs(o)
    assert(regs(o.unionAll(o)) === base)       // duplicates don't move max
    assert(regs(o.repartition(13)) === base)   // merge order irrelevant
  }

  test("kmv intersect: invariants hold and the estimate brackets truth") {
    // sf0.01: both status sets are ~900-1400 distinct keys >> K=64
    val r = Sketch.queries("cs_kmv_intersect")(
      spark, "/root/testdata/sf0.01").collect().head
    val k = r.getAs[Long]("k"); val kEff = r.getAs[Long]("k_eff")
    val common = r.getAs[Long]("common_k")
    val estU = r.getAs[Long]("est_union")
    val estI = r.getAs[Long]("est_intersect")
    val exact = r.getAs[Long]("exact_intersect")
    assert(k === 64L && kEff === 64L)     // sets big enough to fill K
    assert(common >= 0 && common <= kEff)
    assert(estI <= estU)
    // KMV union error is ~1/√(K−2) ≈ 13%; the intersection inherits
    // binomial noise on ρ — accept 3σ-ish 50% relative error, which
    // still catches estimator bugs (off-by-2x, swapped operands)
    val exactU = {
      import org.apache.spark.sql.functions._
      val o = Tables(spark, "/root/testdata/sf0.01", "orders")
      o.filter(col("o_orderstatus").isin("O", "F"))
        .select("o_custkey").distinct().count()
    }
    assert(math.abs(estU - exactU).toDouble / exactU < 0.5,
      s"est_union $estU vs exact $exactU")
    assert(math.abs(estI - exact).toDouble / math.max(exact, 1) < 0.5,
      s"est_intersect $estI vs exact $exact")
  }

  test("freq_sketch under capacity pressure keeps SpaceSaving bounds") {
    import spark.implicits._
    graft.functions.FreqSketch.register(spark)
    // zipf-ish: item i appears (51-i) times, 50 distinct >> capacity 8
    val truth = (1 to 50).map(i => s"w$i" -> (51 - i).toLong).toMap
    val data = truth.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w)
    }
    val n = data.size.toLong
    val cap = 8
    val out = data.toDF("w").repartition(7) // force partial merges
      .agg(expr(s"freq_sketch(w, $cap)").as("s"))
      .collect().head.getString(0)
    val entries = out.split(";").map { e =>
      val Array(w, c, err) = e.split(":")
      (w, c.toLong, err.toLong)
    }
    assert(entries.length === cap)
    entries.foreach { case (w, c, err) =>
      val t = truth.getOrElse(w, 0L)
      assert(c >= t, s"$w: count $c underestimates $t")
      assert(c - err <= t, s"$w: guaranteed floor ${c - err} exceeds $t")
    }
    // every item with true frequency > N/capacity must be present
    val kept = entries.map(_._1).toSet
    truth.filter(_._2 > n / cap).keys.foreach(w =>
      assert(kept.contains(w), s"heavy hitter $w missing"))
  }

  test("freq_sketch with capacity >= vocabulary is exact") {
    graft.functions.FreqSketch.register(spark)
    val rows = Sketch.queries("fs_heavy_hitters")(spark, sf).collect()
    val exact = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === exact.size)
    rows.foreach(r =>
      assert(r.getAs[Long]("cnt") === exact(r.getAs[String]("word"))))
  }

  test("quantile_sketch: histogram reconciles; bounds bracket the truth") {
    val rows = Sketch.queries("qs_quantile_sketch")(spark, sf).collect()
    val cents = Tables(spark, sf, "orders")
      .selectExpr("o_orderstatus",
        "cast(round(o_totalprice * 100) as long) AS c").collect()
      .groupBy(_.getString(0)).map { case (st, rs) =>
        st -> rs.map(_.getLong(1)).sorted
      }
    assert(rows.map(_.getString(0)).toSet === cents.keySet)
    rows.foreach { r =>
      val vals = cents(r.getString(0))
      val counts = r.getAs[String]("sketch").split(",").map(_.toLong)
      assert(counts.length === 64)
      assert(counts.sum === vals.length.toLong)
      assert(r.getAs[Long]("n") === vals.length.toLong)
      // bucket counts equal a local bit-length histogram
      val local = vals.groupBy(v => 64 - java.lang.Long.numberOfLeadingZeros(v) - 1)
        .map { case (b, xs) => b -> xs.length.toLong }
      counts.zipWithIndex.foreach { case (c, b) =>
        assert(c === local.getOrElse(b, 0L), s"bucket $b")
      }
      // within-2x guarantee: p_lo <= exact percentile < 2 * p_lo
      for ((q, lo) <- Seq(
        (vals((vals.length + 1) / 2 - 1), r.getAs[Long]("p50_lo")),
        (vals((9 * vals.length + 9) / 10 - 1), r.getAs[Long]("p90_lo")))) {
        assert(lo <= q && q < 2 * lo, s"bound $lo vs exact $q")
      }
    }
  }

  test("quantile_sketch merge is partitioning-invariant") {
    // the mergeable-state property: 1 partition (no merges) and 64
    // partitions (deep merge tree) must produce identical sketches
    graft.functions.QuantileSketch.register(spark)
    import org.apache.spark.sql.functions.{col, expr, round}
    def sketchWith(parts: Int): Map[String, String] =
      Tables(spark, sf, "orders")
        .select(col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .repartition(parts)
        .groupBy("o_orderstatus")
        .agg(expr("quantile_sketch(cents)").as("sketch"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sketchWith(1) === sketchWith(64))
  }

  test("sketch merge: elementwise-max of group sketches equals direct") {
    val r = graft.operators.Sketch
      .queries("cs_sketch_merge")(spark, sf).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Int]("is_equal") === 1)
    assert(r.head.getAs[String]("merged_registers") ===
      r.head.getAs[String]("direct_registers"))
  }

  test("count-min: estimates never undercount and stay within the CMS bound") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Sketch
      .queries("cs_countmin_probe")(spark, sf).collect()
    assert(rows.length === 10)
    val n = Tables(spark, sf, "lineitem").count()
    rows.foreach { r =>
      val (truth, est) = (r.getAs[Long]("n_true"), r.getAs[Long]("est"))
      // structural guarantee: min over counters ≥ the key's own count
      assert(est >= truth, s"undercount for key ${r.getAs[Long]("key")}")
      // ε = 2/W error bound (deterministic here: fixed data + hashes)
      assert(est - truth <= 2 * n / 256,
        s"overcount ${est - truth} beyond 2N/W for ${r.getAs[Long]("key")}")
    }
    // probes are the true heavy hitters in exact descending order
    val trueTop = Tables(spark, sf, "lineitem")
      .groupBy(col("l_partkey")).count()
      .orderBy(col("count").desc, col("l_partkey")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getAs[Long]("key")).toSeq === trueTop)
  }
}
