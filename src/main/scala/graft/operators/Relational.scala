package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Relational / TPC-H-style analytics over the synthetic star schema.
  *
  * These are the bench headliners: scan-heavy aggregation (q1, q6) and
  * multi-way joins (q3, q5). Dimension sides are broadcast explicitly —
  * at 100 TB the fact table (lineitem) never shuffles for these joins;
  * only the final small groupBy exchanges data.
  */
object Relational {

  /** TPC-H Q1: pricing summary report. Single scan + partial-agg groupBy
    * on a 6-value key — shuffle is a few hundred rows regardless of SF. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 4).as("sum_qty"),
        dsum(col("l_extendedprice"), 4).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 4)
          .as("sum_charge"),
        davg(col("l_quantity"), 6).as("avg_qty"),
        davg(col("l_extendedprice"), 6).as("avg_price"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity", 4)} AS sum_qty,
       |  ${sqlSum("l_extendedprice", 4)} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 4)} AS sum_charge,
       |  ${sqlAvg("l_quantity", 6)} AS avg_qty,
       |  ${sqlAvg("l_extendedprice", 6)} AS avg_price,
       |  ${sqlAvg("l_discount", 6)} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3: top unshipped orders by revenue. customer is the small
    * side → broadcast; orders⋈lineitem co-shuffles on orderkey once. */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
    val li   = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
    li.join(broadcast(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |FROM customer
       |JOIN orders   ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-06-01'
       |  AND l_shipdate  > TIMESTAMP '1997-06-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderdate, l_orderkey
       |LIMIT 10""".stripMargin

  /** TPC-H Q5: revenue by nation for one region. All dims broadcast;
    * the only shuffle is orders⋈lineitem on orderkey (AQE-skew safe). */
  def q5Local(s: SparkSession, dir: String): DataFrame = {
    val reg  = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nat  = Tables.nation(s, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val sup  = Tables.supplier(s, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
    val cust = Tables.customer(s, dir)
    val ord  = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate <  TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q10: returned-item revenue by customer. Dims broadcast;
    * orders⋈lineitem co-shuffles once on orderkey; top-20 by revenue. */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '1996-07-01'
       |  AND o_orderdate <  TIMESTAMP '1997-07-01'
       |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** TPC-H Q18: large-volume orders. The HAVING-aggregate runs first
    * (one shuffle on orderkey, partial aggs map-side); the surviving
    * keys are a tiny set that semi-joins everything else broadcast. */
  def q18LargeOrders(s: SparkSession, dir: String, minQty: Double = 300): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity"), 4).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    ord.join(broadcast(big), col("o_orderkey") === big("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM (
       |  SELECT l_orderkey, ${sqlSum("l_quantity", 4)} AS sum_qty
       |  FROM lineitem GROUP BY 1
       |) big
       |JOIN orders ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE sum_qty > 300
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin

  /** TPC-H Q6: forecasting revenue change. Pure filter+agg — every
    * predicate pushes to the parquet scan; result is a single row. */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q6Sql: String =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount", 4)} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate <  TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.03 AND 0.07
       |  AND l_quantity < 24""".stripMargin
}
