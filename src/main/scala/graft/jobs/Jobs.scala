package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.{PdfText, TextFunctions}

/** The reference's three curation stored procedures (SURVEY.md §2.10 D2)
  * as plain Scala table-in/table-out jobs. Each exposes a pure
  * `transform` (unit-testable, oracle-checkable) plus a `run` that reads
  * the catalog and overwrites the target table (S8/S9).
  */
object CustomerStandardize {

  /** Reference code/curate/02_customer_sp.sql:24-31: clean the three
    * phone columns, split NAME at the first space, rename POSTCODE→ZIP,
    * project the standardized column set. Column resolution is
    * case-insensitive, as in the reference's loads. */
  def transform(cust: DataFrame): DataFrame = {
    import TextFunctions._
    cust
      .withColumn("WORK_PHONE", cleanPhone(col("work_phone")))
      .withColumn("CELL_PHONE", cleanPhone(col("cell_phone")))
      .withColumn("HOME_PHONE", cleanPhone(col("home_phone")))
      .withColumn("FIRST_NAME", firstName(col("NAME")))
      .withColumn("LAST_NAME", lastName(col("NAME")))
      .withColumnRenamed("POSTCODE", "ZIP")
      .select(col("CUSTOMER_ID"), col("FIRST_NAME"), col("LAST_NAME"),
        col("DOB"), col("JOB_TITLE"), col("COMPANY"), col("STREET"),
        col("CITY"), col("STATE"), col("ZIP"), col("COUNTRY"),
        col("HOME_PHONE"), col("CELL_PHONE"), col("WORK_PHONE"))
  }

  def run(spark: SparkSession, inTable: String, outTable: String): Unit =
    TableIO.overwrite(spark, transform(spark.table(inTable)), outTable)
}

object InvoiceParse {

  /** Reference code/curate/03_invoice_sp.sql: directory scan → dedup →
    * PDF→text UDF → labeled-field extraction. The UDF is the one place a
    * closure is required (binary decode); everything else is codegen'd
    * column expressions. Dedup runs BEFORE the expensive UDF — the
    * reference's deliberate plan shape (3B2_load_pdf_to_text.sql:2-6). */
  private val pdfToText = udf((bytes: Array[Byte]) => PdfText.extract(bytes))

  def parse(rawText: DataFrame): DataFrame =
    rawText.select(
      col("relative_path") +: TextFunctions.invoiceFields(col("pdf_text")): _*)

  def transform(spark: SparkSession, pdfDir: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(pdfDir)
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("relative_path"),
        col("content"))
      .dropDuplicates("relative_path") // A3 dedup pre-UDF
    parse(files.withColumn("pdf_text", pdfToText(col("content"))))
  }

  def run(spark: SparkSession, pdfDir: String, outTable: String): Unit =
    TableIO.overwrite(spark, transform(spark, pdfDir), outTable)
}

object SalesEnrich {

  /** Reference code/curate/04_sales_enrich_sp.sql: derive the sales
    * amount, join the fact to customer demographics, build a
    * deduplicated product master with a row_number window, left-join it,
    * distinct, overwrite. On testdata: lineitem ⋈ orders ⋈ customer +
    * part-master. The two dimension joins broadcast (small sides);
    * the master dedup shuffles only the dimension table. */
  def transform(sales: DataFrame, orders: DataFrame, customer: DataFrame,
                part: DataFrame): DataFrame = {
    val amt = (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))
      .cast(DecimalType(38, 4))
    val fact = sales.withColumn("net_amt", amt)
    val withCust = fact
      .join(orders, fact("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("net_amt"), col("c_custkey"), col("c_name"),
        col("c_mktsegment"))
    val w = Window.partitionBy("p_name").orderBy("p_partkey")
    val master = part
      .withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .select(col("p_partkey").as("master_partkey"), col("p_name"),
        col("p_brand"), col("p_type"))
    withCust
      .join(master, withCust("l_partkey") === master("master_partkey"),
        "left")
      .drop("master_partkey")
      .distinct()
  }

  def run(spark: SparkSession, dir: String, outTable: String): Unit = {
    import graft.Tables
    TableIO.overwrite(spark,
      transform(Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"),
        Tables(spark, dir, "customer"), Tables(spark, dir, "part")),
      outTable)
  }
}
