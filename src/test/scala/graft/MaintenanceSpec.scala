package graft

import org.apache.spark.sql.functions._
import graft.jobs.Upsert

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, inserts land, untouched rows survive") {
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "n")
    val updates = Seq((2L, "B2", 99), (4L, "d", 40)).toDF("k", "v", "n")
    val out = Upsert.merge(target, updates, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30),
      (4L, "d", 40)))
  }

  test("scd2: history is gap-free, one current row per key") {
    val rows = graft.operators.Maintenance
      .queries("scd2_history")(spark, sf).collect()
    val byKey = rows.groupBy(_.getAs[Long]("c_custkey"))
    val nCust = Tables(spark, sf, "customer").count()
    assert(byKey.size === nCust)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getAs[String]("valid_from"))
      // exactly one open version, and it is the last
      assert(vs.count(_.getAs[Boolean]("is_current")) === 1, s"key $k")
      assert(sorted.last.getAs[String]("valid_to") === "9999-12-31")
      // each version closes exactly where the next one opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") ===
            b.getAs[String]("valid_from"), s"gap at key $k")
        case _ => ()
      }
      val expected = if (k % 7 == 0) 2 else 1
      assert(vs.length === expected, s"key $k has ${vs.length} versions")
    }
  }

  test("dq: quarantine split is total and matches the summary row") {
    import graft.jobs.DataQuality
    val li = Tables(spark, sf, "lineitem")
    val rules = Seq(
      "qty_le_25" -> (col("l_quantity") <= 25),
      "disc_le_05" -> (col("l_discount") <= 0.05),
      "price_pos" -> (col("l_extendedprice") > 0))
    val (pass, quar) = DataQuality.quarantine(li, rules)
    val summary = DataQuality.summary(li, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pass.count() + quar.count() === li.count())
    assert(quar.count() === summary("rows_quarantined"))
    assert(summary("rows_quarantined") > 0, "rules must actually fire")
    assert(summary("price_pos") === 0, "sanity rule must pass everywhere")
    // quarantined rows violate at least one rule; passed rows violate none
    val ok = rules.map(_._2).reduce(_ && _)
    assert(pass.filter(!ok).count() === 0)
    assert(quar.filter(ok).count() === 0)
  }

  test("cdc diff: I/U/D counts match the synthetic change recipe") {
    val out = graft.operators.Maintenance
      .queries("cdc_snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(out("D") === keys.count(_ % 97 == 0).toLong)
    assert(out("I") === keys.count(_ % 10 == 0).toLong)
    assert(out("U") === keys.count(k => k % 10 == 0 && k % 97 != 0).toLong)
  }

  test("analyze stats: ndv/min/max/nulls agree with direct queries") {
    val rows = graft.operators.Maintenance
      .queries("mt_analyze_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = Tables(spark, sf, "lineitem")
    assert(rows("l_returnflag").getAs[Long]("ndv") ===
      li.select("l_returnflag").distinct().count())
    assert(rows("l_partkey").getAs[Double]("min_d") ===
      li.agg(min("l_partkey")).head.getLong(0).toDouble)
    assert(rows("l_quantity").getAs[Long]("n_nulls") === 0L)
    assert(rows("l_returnflag").isNullAt(
      rows("l_returnflag").fieldIndex("min_d")))
  }

  test("compaction: file count collapses, content is untouched") {
    val out = graft.operators.Maintenance
      .queries("mt_compaction")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val direct = Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === direct, "compaction must not change row content")
    val base = s"/tmp/graft_scratch/${sf.replaceAll("[^A-Za-z0-9.]", "_")}"
    def nFiles(tag: String) =
      new java.io.File(s"$base/$tag").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(nFiles("events_small") === 64)
    val compacted = nFiles("events_compacted")
    assert(compacted >= 1 && compacted < 8,
      s"expected a handful of right-sized files, got $compacted")
  }

  test("dynamic overwrite rewrites ONLY the restated partition's files") {
    // run the query once so the two-step write completes, then prove
    // the physical claim: every partition except the restated min day
    // kept its exact files (names AND mtimes), i.e. the second write
    // never touched them
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    graft.operators.Maintenance
      .queries("pw_dynamic_overwrite")(spark, sf).collect()
    val root = Paths.get(s"/tmp/graft_scratch/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/events_dynpart")
    def snapshot(): Map[String, Long] =
      Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    val before = snapshot()
    // rerun: the first full write rewrites everything, then the dynamic
    // step restates min-day only — so compare around JUST the dynamic
    // step by replaying it directly
    val ev = Tables.events(spark, sf)
      .withColumn("day", org.apache.spark.sql.functions.to_date(col("ts")))
      .select("event_id", "event_type", "value", "day")
    val minDay = ev.agg(org.apache.spark.sql.functions.min("day"))
      .head().getDate(0)
    ev.filter(col("day") === org.apache.spark.sql.functions.lit(minDay))
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(root.toString)
    val after = snapshot()
    val restated = s"day=$minDay"
    val untouchedBefore = before.filterNot(_._1.contains(restated))
    val untouchedAfter = after.filterNot(_._1.contains(restated))
    assert(untouchedBefore === untouchedAfter,
      "non-restated partitions must keep their exact files")
    // and the restated partition WAS rewritten
    assert(before.keySet.filter(_.contains(restated)) !=
      after.keySet.filter(_.contains(restated)) ||
      before.filter(_._1.contains(restated)) !=
        after.filter(_._1.contains(restated)),
      "the restated partition must have new files")
  }

  test("salted join equals unsalted join") {
    val salted = graft.operators.Maintenance
      .queries("sj_salted_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val li = Tables(spark, sf, "lineitem")
      .withColumn("sk_partkey",
        when(col("l_orderkey") % 3 === 0, lit(1L)).otherwise(col("l_partkey")))
    val plain = li.join(Tables(spark, sf, "part"),
        col("sk_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted === plain)
  }

  test("incremental MV: merge-refresh equals full recompute, delta-only scan") {
    val got = operators.Maintenance.queries("mv_incremental")(spark, sf)
    // full recompute in Spark as the in-engine cross-check
    val want = Tables(spark, sf, "orders")
      .groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
    val drift = got.select("o_orderpriority", "ym", "n_orders", "revenue")
      .except(want.select("o_orderpriority", "ym", "n_orders", "revenue"))
      .count()
    assert(drift === 0)
    // the refresh plan reads the stored state and ONLY the delta from
    // the fact table: its orders scan pushes the cutoff predicate
    val phys = got.queryExecution.executedPlan.toString
    assert(phys.contains("mv_base"))
    assert(phys.contains("o_orderdate"))
    assert(phys.toLowerCase.contains("greaterthanorequal") ||
      phys.contains(">= 2001-01-01"))
  }

  test("join profiler estimates EQUAL executed join cardinalities") {
    val got = graft.operators.Maintenance
      .queries("mt_join_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = Tables(spark, sf, "lineitem")
    val actualLO = li.join(Tables(spark, sf, "orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val actualLP = li.join(Tables(spark, sf, "part"),
      col("l_partkey") === col("p_partkey")).count()
    assert(got("lineitem_orders") === actualLO)
    assert(got("lineitem_part") === actualLP)
  }

  test("skew advisor flags the hot key salting then handles") {
    val rows = graft.operators.Maintenance
      .queries("mt_skew_advisor")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // the synthesized hot key (1) dominates: ~1/3 of all rows
    assert(rows.head._1 === 1L)
    assert(rows.head._4 === "salt")
    assert(rows.head._3 > 3000L && rows.head._3 < 3700L) // basis points
    // the uniform tail is individually cold
    assert(rows.tail.forall(_._4 === "hash_ok"))
  }

  test("join-view IVM: three-term delta refresh equals full recompute") {
    import org.apache.spark.sql.types.DecimalType
    val got = graft.operators.Maintenance
      .queries("mv_join_delta")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("rev"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === full)
  }

  test("file skipping: clustered layout prunes all-but-one, ingest none") {
    val rows = graft.operators.Maintenance
      .queries("mt_file_skipping")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (dcN, dcSkip, dcBp) = rows("date_clustered")
    // June 1997 sits inside one quarter file: every other file prunes
    assert(dcSkip === dcN - 1)
    assert(dcBp === (dcN - 1) * 10000 / dcN)
    // orderkey-ranged files span the full date range: zone maps skip 0
    val (_, ioSkip, ioBp) = rows("ingest_order")
    assert(ioSkip === 0L && ioBp === 0L)
  }

  test("time travel: snapshots conserve rows and differ by the restated set") {
    val rows = graft.operators.Maintenance
      .queries("tt_asof_read")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byInstant = rows.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val n = spark.read.parquet(s"$sf/customer.parquet").count()
    val nPromo = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") % 7 === 0).count()
    // every snapshot is a complete table: totals conserved
    assert(byInstant.values.forall(_.values.sum === n))
    // March predates the re-segmentation; July reflects it exactly
    assert(!byInstant("2024-03-15").contains("PROMO"))
    assert(byInstant("2024-07-01")("PROMO") === nPromo)
    // July's non-PROMO segments shrink by exactly their restated rows
    val shrunk = byInstant("2024-03-15").map { case (seg, c) =>
      c - byInstant("2024-07-01").getOrElse(seg, 0L)
    }.sum
    assert(shrunk === nPromo)
  }

  test("clustering depth: clustered layout reads 1, interleaved reads n") {
    val rows = graft.operators.Maintenance
      .queries("mt_clustering_depth")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (_, dcMax, dcAvg) = rows("date_clustered")
    // quarter files are disjoint by construction: every start sees
    // exactly its own interval
    assert(dcMax === 1L && dcAvg === 100L)
    // orderkey-ranged files all span the full shipdate range: the
    // deepest start sees every file open — the re-cluster signal
    val (ioN, ioMax, ioAvg) = rows("ingest_order")
    assert(ioMax === ioN)
    // at sf0.001 a single 1500-order range yields one file (avg 100);
    // with 2+ files the interleave must show
    assert(if (ioN > 1) ioAvg > 100L else ioAvg === 100L)
  }

  test("iv_time_weighted conserves customer-days and splits PROMO") {
    import org.apache.spark.sql.functions._
    val rows = operators.Maintenance
      .queries("iv_time_weighted")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val n = cust.count()
    val nPromo = cust.filter(col("c_custkey") % 7 === 0).count()
    // every customer contributes exactly 366 days of 2024 (leap year)
    assert(rows.values.sum === 366L * n)
    // PROMO mass = Jun 1 → Jan 1 = 214 days per restated customer
    assert(rows("PROMO") === 214L * nPromo)
    assert(rows.keys.size === 6) // 5 segments + PROMO
  }
}
