package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric","value","unit","queries","errors","sf"}.
  *
  * Parallelism defaults to every core the machine has (the driver runs
  * local[32]); SPARK_GRAFT_CPUS overrides. Shuffle partitions are pinned
  * to the worker count so tiny-data shuffles don't fan out into hundreds
  * of empty tasks.
  *
  * A warm-up action runs first so JVM/classloader/codegen startup cost
  * does not land on whichever query happens to execute first; queries
  * are timed in sorted name order for run-to-run comparability. A query
  * that throws still reports its time-to-failure but is listed in
  * "errors" — a silently broken query must not look green.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: pay session/codegen startup outside the timed region
    Tables(spark, sfDir, "lineitem").count()
    Tables(spark, sfDir, "orders").count()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => failed += name }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // clear per-query caches outside the timed region so one query's
      // pinned blocks don't skew the next query's memory
      spark.catalog.clearCache()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
