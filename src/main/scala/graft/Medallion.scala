package graft

import org.apache.spark.sql.SparkSession

/** Medallion zone layout (SURVEY.md §1.1): raw → processed → curated as
  * catalog databases. Raw tables are zero-copy views over the source
  * parquet; processed/curated are populated by the curation jobs
  * (jobs.CurationPipeline writes the table content — this utility owns
  * the namespace layout).
  */
object Medallion {
  val zones: Seq[String] = Seq("graft_raw", "graft_processed", "graft_curated")

  def init(spark: SparkSession, dir: String): Unit = {
    // events.parquet is TIMESTAMP(NANOS); views are evaluated lazily, so
    // the session must carry the legacy conf before any read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    zones.foreach(z => spark.sql(s"CREATE DATABASE IF NOT EXISTS $z"))
    Tables.names.foreach { n =>
      spark.sql(s"""CREATE OR REPLACE VIEW graft_raw.$n AS
                   |SELECT * FROM parquet.`$dir/$n.parquet`""".stripMargin)
    }
  }

  /** Run the standardization job raw → processed through the catalog. */
  def curateCustomers(spark: SparkSession, dir: String): Unit = {
    operators.Curation.customerInput(spark, dir)
      .createOrReplaceTempView("graft_customer_raw_shaped")
    jobs.CustomerStandardize.run(spark, "graft_customer_raw_shaped",
      "graft_processed.customer")
  }
}
