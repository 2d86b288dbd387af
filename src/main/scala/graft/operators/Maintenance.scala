package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.jobs.Upsert

/** Table-maintenance operators: MERGE-semantics upsert, date-partitioned
  * fact writes with partition pruning, and skew-salted joins. These are
  * the write-path/scale techniques the reference delegates to Snowflake
  * (micro-partitions, automatic clustering, skew handling) re-expressed
  * as explicit Spark plans.
  */
object Maintenance {
  type Q = (SparkSession, String) => DataFrame

  private def scratch(dir: String, tag: String): String =
    s"/tmp/graft_scratch/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$tag"

  val queries: Map[String, Q] = Map(
    // MERGE upsert: every 10th order is "updated" (priority rewritten,
    // price bumped by exactly 1.00), plus brand-new synthetic rows.
    "up_merge" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          dec2(col("o_totalprice")).as("price"), col("o_orderpriority"))
      val updates = orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderpriority", lit("0-MERGED"))
        .withColumn("price", col("price") + lit(1).cast(DecimalType(18, 2)))
      val inserts = updates
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
      Upsert.merge(orders, updates.unionAll(inserts), Seq("o_orderkey"))
        .withColumn("price", col("price").cast("double"))
        .orderBy("o_orderkey")
    }),

    // Date-partitioned fact write + partition-pruned read-back: the
    // month filter must hit PartitionFilters, not row filters.
    "pw_partition_prune" -> ((s, dir) => {
      val path = scratch(dir, "fact_partitioned")
      Tables(s, dir, "orders")
        .withColumn("order_month",
          date_format(col("o_orderdate"), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("order_month").parquet(path)
      s.read.parquet(path)
        .filter(col("order_month") === "1995-03")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double")
            .as("total"))
        .orderBy("o_orderstatus")
    }),

    // Skew-salted join: a synthetically skewed key (a third of all rows
    // collapse onto partkey 1) joined to part by exploding the small
    // side over N salts and salting the big side deterministically —
    // the hot key spreads over N tasks instead of one straggler.
    "sj_salted_join" -> ((s, dir) => {
      val nSalts = 8
      val li = Tables(s, dir, "lineitem")
        .withColumn("sk_partkey",
          when(col("l_orderkey") % 3 === 0, lit(1L))
            .otherwise(col("l_partkey")))
        .withColumn("salt",
          pmod(hash(col("l_orderkey") * 31 + col("l_linenumber")),
            lit(nSalts)))
      val p = Tables(s, dir, "part")
        .withColumn("salt",
          explode(sequence(lit(0), lit(nSalts - 1))))
      li.join(p,
          li("sk_partkey") === p("p_partkey") && li("salt") === p("salt"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(DecimalType(38, 2))).cast("double")
            .as("rev"))
        .orderBy("p_brand")
    })
  )

  private def dec2(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  val oracles: Map[String, String] = Map(
    "up_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |         o_orderpriority
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(price + 1 AS DECIMAL(19,2)) AS price,
        |         '0-MERGED' AS o_orderpriority
        |  FROM base WHERE o_orderkey % 10 = 0),
        |ins AS (
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, price,
        |         o_orderpriority
        |  FROM upd),
        |allrows AS (
        |  SELECT *, 0 AS src FROM base
        |  UNION ALL SELECT *, 1 FROM upd
        |  UNION ALL SELECT *, 1 FROM ins)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |       CAST(price AS DOUBLE) AS price, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                                   ORDER BY src DESC) AS rn
        |      FROM allrows) t
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

    "pw_partition_prune" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "sj_salted_join" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1
        |              ELSE l_partkey END AS sk_partkey,
        |         l_extendedprice
        |  FROM lineitem)
        |SELECT p_brand, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS rev
        |FROM li JOIN part ON sk_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
