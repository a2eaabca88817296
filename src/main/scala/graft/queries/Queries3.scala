package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third tranche of oracle-checked queries — the operator classes not yet
  * driver-gated: window FRAMES (moving aggregates), lead/lag deltas, CUBE,
  * grouped argmax over aggregated values, ordered string aggregation,
  * ntile bucketing, conditional distinct counting.
  *
  * Same DuckDB-parity conventions as Queries/Queries2: BIGINT-only
  * numerics (outer CAST on every DuckDB sum — its sum() returns HUGEINT),
  * total orders everywhere a window or pick could tie. */
object Queries3 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Q24 — window FRAME: per-user moving sum of event values over the last
  // 3 events (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), cents-exact.
  def q24MovingSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-2, 0)
    t(spark, dir, "events")
      .withColumn("cents", round(col("value") * 100).cast("bigint"))
      .select(col("user_id"), col("event_id"),
        sum(col("cents")).over(w).as("moving_cents"))
  }

  val q24Sql: String =
    """SELECT user_id, event_id,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
      |         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents
      |FROM events""".stripMargin

  // Q25 — CUBE over status × priority (all grouping-set combinations).
  def q25CubeOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  val q25Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // Q26 — lead/lag delta: days since the customer's previous order.
  def q26OrderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("prev_date", lag(to_date(col("o_orderdate")), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        coalesce(datediff(to_date(col("o_orderdate")), col("prev_date")), lit(-1))
          .cast("bigint").as("gap_days"))
  }

  val q26Sql: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(coalesce(datediff('day',
      |         lag(CAST(o_orderdate AS DATE)) OVER (
      |           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      |         CAST(o_orderdate AS DATE)), -1) AS BIGINT) AS gap_days
      |FROM orders""".stripMargin

  // Q27 — grouped argmax over an AGGREGATED value: per ship-year, the part
  // with the highest total quantity (total order: qty desc, partkey asc).
  def q27TopPartPerYear(spark: SparkSession, dir: String): DataFrame = {
    val agg = t(spark, dir, "lineitem")
      .groupBy(year(col("l_shipdate")).cast("bigint").as("ship_year"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("qty"))
    val w = Window.partitionBy(col("ship_year"))
      .orderBy(col("qty").desc, col("l_partkey").asc)
    agg.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("ship_year"), col("l_partkey").as("top_partkey"), col("qty"))
  }

  val q27Sql: String =
    """SELECT ship_year, l_partkey AS top_partkey, qty FROM (
      |  SELECT ship_year, l_partkey, qty,
      |         row_number() OVER (PARTITION BY ship_year
      |                            ORDER BY qty DESC, l_partkey ASC) AS rn
      |  FROM (SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year, l_partkey,
      |               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |        FROM lineitem GROUP BY 1, 2))
      |WHERE rn = 1""".stripMargin

  // Q28 — ordered string aggregation: brands per size as a sorted CSV.
  def q28BrandCsv(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_size").cast("bigint").as("p_size"), col("p_brand"))
      .distinct()
      .groupBy(col("p_size"))
      .agg(array_join(array_sort(collect_set(col("p_brand"))), ",").as("brands"))

  val q28Sql: String =
    """SELECT CAST(p_size AS BIGINT) AS p_size,
      |       string_agg(p_brand, ',' ORDER BY p_brand) AS brands
      |FROM (SELECT DISTINCT p_size, p_brand FROM part)
      |GROUP BY p_size""".stripMargin

  // Q29 — ntile quartiles of customers by balance (total order includes
  // the key, so bucket boundaries are deterministic in both engines).
  //
  // SCALE: a bare ntile(4) OVER (ORDER BY ...) is a partition-less window —
  // Spark moves the whole table through ONE task (the "No Partition Defined
  // for Window" warning; a scale-killer at 100x). Equivalent distributed
  // plan: range-partition on the total order, per-partition local
  // row_number (window partitioned by the range-partition id), add
  // broadcast prefix-count offsets -> exact global rank -> ntile bucket by
  // integer arithmetic (first n%4 buckets get floor(n/4)+1 rows). Output is
  // identical to ntile(4); no stage sees more than one partition's rows.
  def q29BalanceQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    // Ordered split keys from a deterministic hash-ordered sample (NOT
    // repartitionByRange: the RangePartitioner's sample seed depends on the
    // RDD id, so its boundaries differ between the size-count job and the
    // final job — observed as wrong quartile sizes). The sample is a pure
    // function of the data, so every job splits identically.
    val parts = spark.sessionState.conf.numShufflePartitions
    val sample = cust
      .select(col("c_acctbal").cast("double"), col("c_custkey").cast("long"))
      .orderBy(xxhash64(col("c_custkey")))
      .limit(4096)
      .as[(Double, Long)].collect()
      .sorted
    val nb = math.max(1, math.min(parts, sample.length)) // number of groups
    val boundaries = (1 until nb).map(i => sample(i * sample.length / nb)).toArray
    val bB = spark.sparkContext.broadcast(boundaries)
    // group = #boundaries <= key (binary search over the broadcast array)
    val grpUdf = udf { (bal: Double, key: Long) =>
      val bs = bB.value
      var lo = 0; var hi = bs.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val (bBal, bKey) = bs(mid)
        if (bBal < bal || (bBal == bal && bKey <= key)) lo = mid + 1 else hi = mid
      }
      lo
    }
    val grouped = cust.withColumn(
      "grp", grpUdf(col("c_acctbal").cast("double"), col("c_custkey").cast("long")))
    // group sizes: tiny (#groups rows) -> prefix offsets on the driver,
    // broadcast back; grp indexes the boundary order, so sorting by grp is
    // the total order.
    val sizes = grouped.groupBy("grp").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = sizes.map(_._2).sum
    var acc = 0L
    val offsets = sizes.map { case (g, c) => val o = acc; acc += c; (g, o) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("grp", "off")
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val q = n / 4
    val rem = n % 4
    grouped
      .withColumn("lr", row_number().over(w).cast("bigint"))
      .join(broadcast(offDf), Seq("grp"))
      .withColumn("r", col("off") + col("lr"))
      .withColumn(
        "quartile",
        when(col("r") <= lit(rem * (q + 1)), expr(s"(r + $q) div ${q + 1}"))
          .otherwise(lit(rem) + expr(s"(r - ${rem * (q + 1)} + ${q - 1}) div ${math.max(q, 1L)}")))
      .groupBy(col("quartile"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("c_acctbal") * 100).cast("bigint")).as("balance_cents"))
  }

  val q29Sql: String =
    """SELECT quartile, count(*) AS n,
      |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS balance_cents
      |FROM (SELECT CAST(ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS BIGINT) AS quartile,
      |             c_acctbal
      |      FROM customer)
      |GROUP BY quartile""".stripMargin

  // Q30 — conditional DISTINCT aggregation: per nation, distinct customers
  // vs distinct customers holding a negative balance.
  def q30NationCustomerFacets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        countDistinct(when(col("c_acctbal") < 0, col("c_custkey"))).as("n_negative"))

  val q30Sql: String =
    """SELECT c_nationkey, count(DISTINCT c_custkey) AS n_customers,
      |       count(DISTINCT CASE WHEN c_acctbal < 0 THEN c_custkey END) AS n_negative
      |FROM customer GROUP BY c_nationkey""".stripMargin
}
