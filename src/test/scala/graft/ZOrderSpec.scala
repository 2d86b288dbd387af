package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.MortonCode

class ZOrderSpec extends SparkSpec {

  test("morton code matches a bit-by-bit reference interleave") {
    MortonCode.register(spark)
    def ref(x: Int, y: Int): Long = {
      var m = 0L
      for (b <- 0 until 16) {
        m |= ((x >> b) & 1).toLong << (2 * b)
        m |= ((y >> b) & 1).toLong << (2 * b + 1)
      }
      m
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq((0, 0), (65535, 65535), (1, 0), (0, 1)) ++
      Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    import spark.implicits._
    val got = cases.toDF("x", "y")
      .withColumn("m", expr("morton(x, y)"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (x, y, m) => assert(m === ref(x, y), s"($x,$y)") }
  }

  test("z-order layout prunes files on the NON-leading dimension too") {
    // A full 256x256 grid written two ways: sorted by x alone, and laid
    // out along the morton curve. 16 files = 4096 rows each = exactly a
    // 64x64 z-block, so each Z-file spans only 1/4 of EACH dimension.
    // For a y-only predicate, per-file [min,max] y stats prune nothing
    // in the x-sorted layout (every file spans all y) but 3/4 of the
    // Z-files. The granularity condition is the real-world one: file
    // count must exceed the per-dimension strip count you want pruned.
    MortonCode.register(spark)
    import spark.implicits._
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x, y)))
      .toDF("x", "y")
    val base = Files.createTempDirectory("graft_zorder")
    val byKey = base.resolve("bykey").toString
    val byZ = base.resolve("byz").toString
    val parts = 16
    grid.repartitionByRange(parts, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(byKey)
    grid.withColumn("z", expr("morton(x, y)"))
      .repartitionByRange(parts, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(byZ)

    val (lo, hi) = (96, 127) // a y strip inside one 64-wide z band
    def filesIntersecting(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
        r.getInt(0) <= hi && r.getInt(1) >= lo
      }
      (hit, files.length)
    }
    val (keyHit, keyTotal) = filesIntersecting(byKey)
    val (zHit, zTotal) = filesIntersecting(byZ)
    assert(keyTotal === parts && zTotal === parts)
    // x-sorted layout: y is unclustered -> every file intersects
    assert(keyHit === keyTotal, s"$keyHit/$keyTotal")
    // Z layout: y clusters too -> at least half the files skip
    assert(zHit <= zTotal / 2, s"z $zHit of $zTotal")
  }

  test("zo_zorder_scan returns the same box aggregate as a direct scan") {
    val got = graft.operators.Maintenance
      .queries("zo_zorder_scan")(spark, sf).collect()
    MortonCode.register(spark)
    val direct = Tables(spark, sf, "lineitem")
      .filter(col("l_partkey").between(1, 400)
        && col("l_suppkey").between(1, 20))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("morton(l_partkey % 65536, l_suppkey % 65536)"))
          .as("sum_zcode"))
      .orderBy("l_returnflag").collect()
    assert(got.map(_.toString).toSeq === direct.map(_.toString).toSeq)
    assert(got.nonEmpty)
  }
}
