package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second tranche of oracle-checked queries: rollups, conditional
  * aggregation, string functions, set operations, date bucketing,
  * correlated-shape aggregates — the remaining relational operator
  * classes of SURVEY §2 with exact DuckDB parity. */
object Queries2 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Q16 — fact-fact join + discounted revenue (cents-exact).
  def q16RevenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
          .as("revenue_cents"),
        count(lit(1)).as("n_items"))
  }

  val q16Sql: String =
    """SELECT o_orderpriority,
      |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       count(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // Q17 — ROLLUP hierarchy (A9's cube-shaped counting is this class).
  def q17RollupOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  val q17Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  // Q18 — string expression pipeline (F-class scalar functions).
  def q18PartStrings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n"),
        min(upper(col("p_name"))).as("first_name_upper"),
        max(length(col("p_name"))).cast("bigint").as("max_name_len"),
        countDistinct(substring(col("p_type"), 1, 5)).as("n_type_prefixes"))

  val q18Sql: String =
    """SELECT p_brand, count(*) AS n, min(upper(p_name)) AS first_name_upper,
      |       CAST(max(length(p_name)) AS BIGINT) AS max_name_len,
      |       count(DISTINCT substring(p_type, 1, 5)) AS n_type_prefixes
      |FROM part GROUP BY p_brand""".stripMargin

  // Q19 — conditional aggregation (pivot-shaped; the evaluator's per-mode
  // counter fan-out is this class). Event-type domain is fixed across all
  // driver sfs (asserted in QueriesSpec).
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def q19EventPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        EventTypes.map(tp =>
          sum(when(col("event_type") === tp, 1L).otherwise(0L)).as(s"n_$tp")): _*)

  val q19Sql: String = {
    val cols = EventTypes.map(tp =>
      s"CAST(sum(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS BIGINT) AS n_$tp").mkString(", ")
    s"SELECT user_id, count(*) AS n_events, $cols FROM events GROUP BY user_id"
  }

  // Q20 — set operations (U-class): nations with customers vs suppliers.
  def q20NationSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    val both = c.intersect(s).withColumn("relation", lit("both"))
    val custOnly = c.except(s).withColumn("relation", lit("customer_only"))
    val suppOnly = s.except(c).withColumn("relation", lit("supplier_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
  }

  val q20Sql: String =
    """SELECT nationkey, 'both' AS relation
      |FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |      INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'customer_only' AS relation
      |FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |      EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'supplier_only' AS relation
      |FROM (SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |      EXCEPT SELECT DISTINCT c_nationkey FROM customer)""".stripMargin

  // Q21 — calendar bucketing (date functions).
  def q21ShipMonths(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(
        year(col("l_shipdate")).cast("bigint").as("ship_year"),
        month(col("l_shipdate")).cast("bigint").as("ship_month"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("bigint")).as("qty"))

  val q21Sql: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |       CAST(month(l_shipdate) AS BIGINT) AS ship_month,
      |       count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  // Q22 — having-shaped correlated aggregate: parts ordered in >3 orders.
  def q22PopularParts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .where(col("n_orders") > 3)

  val q22Sql: String =
    """SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY l_partkey HAVING count(DISTINCT l_orderkey) > 3""".stripMargin

  // Q23 — T6 limit with total order (deterministic top-N at sink).
  def q23TopDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .limit(25)
      .select(col("doc_id"), col("n_chars"))

  val q23Sql: String =
    """SELECT doc_id, n_chars FROM documents
      |ORDER BY n_chars DESC, doc_id ASC LIMIT 25""".stripMargin
}
