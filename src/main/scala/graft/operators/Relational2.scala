package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Second tranche of TPC-H-style relational coverage (SURVEY §2 B15d-f,
  * B15g-k), adapted to the driver schema (no partsupp; lineitem has no
  * commitdate/shipmode — predicates use the available columns with the
  * same plan shapes as the originals).
  *
  * Plan-shape notes mirror Relational: dimensions broadcast, fact-fact
  * joins co-shuffle once on their key, aggregates are partial-agg
  * friendly (decimal sums are algebraic), top-N goes through a bounded
  * sort.
  */
object Relational2 {

  /** Q4 (adapted): order-priority checking — orders in a quarter with at
    * least one line shipped after the order date. Left-semi join: the
    * fact side never duplicates, the groupBy key is 5 values. */
  def q4Priority(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-04-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q7 (adapted): volume shipping between two nations, by year. The
    * supplier/customer/nation dimensions broadcast; lineitem⋈orders is
    * the one co-shuffle. */
  def q7Volume(s: SparkSession, dir: String,
               nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val nat = Tables.nation(s, dir)
    val sup = Tables.supplier(s, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
              (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |       EXTRACT(year FROM l_shipdate) AS l_year,
       |       ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  /** Q12 (adapted): priority mix per line status for a ship-year —
    * conditional aggregation after one co-shuffle join. */
  def q12Priority(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
    li.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .cast("long").as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .cast("long").as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q13: customer order-count distribution. Orders pre-aggregate on
    * custkey (partial aggs), then a broadcast-right join onto customer —
    * the fact table is aggregated before it ever meets the dimension. */
  def q13Custdist(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    Tables.customer(s, dir)
      .join(broadcast(counts), col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14: promo revenue share in a month. part broadcasts; one scan of
    * the date-pruned lineitem. */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .agg(r(lit(100.0) *
             dsum(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0))) /
             dsum(disc), 4).as("promo_revenue"))
  }

  val q14Sql: String =
    s"""SELECT floor((100.0 * ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       | / ${sqlSum("l_extendedprice * (1.0 - l_discount)")}) * 1e4 + 0.5) / 1e4 AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
       |  AND l_shipdate <  TIMESTAMP '1996-04-01'""".stripMargin

  /** Q15 (adapted): top suppliers by quarterly revenue. Revenue
    * aggregates on suppkey before the (broadcast) supplier join. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-10-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("total_revenue"))
    rev.join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("total_revenue").desc, col("s_suppkey"))
      .limit(10)
  }

  val q15Sql: String =
    s"""SELECT s_suppkey, s_name, total_revenue FROM (
       |  SELECT l_suppkey, ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-10-01'
       |    AND l_shipdate <  TIMESTAMP '1997-01-01'
       |  GROUP BY 1) rev
       |JOIN supplier ON l_suppkey = s_suppkey
       |ORDER BY total_revenue DESC, s_suppkey
       |LIMIT 10""".stripMargin

  /** Q17 (adapted): small-quantity-order revenue for one brand. The
    * per-part average joins back co-partitioned on partkey — no second
    * scan shape change at scale. */
  def q17SmallQty(s: SparkSession, dir: String, brand: String = "Brand#2"): DataFrame = {
    val partKeys = Tables.part(s, dir).filter(col("p_brand") === brand)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .join(broadcast(partKeys), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQ = li.groupBy(col("l_partkey")).agg(davg(col("l_quantity"), 6).as("avg_qty"))
    li.join(avgQ, Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(r(dsum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"),
           count(lit(1)).as("n_items"))
  }

  val q17Sql: String =
    s"""SELECT floor((${sqlSum("l_extendedprice")} / 7.0) * 1e4 + 0.5) / 1e4 AS avg_yearly,
       |       count(*) AS n_items
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN (SELECT l_partkey AS ap, ${sqlAvg("l_quantity", 6)} AS avg_qty
       |      FROM lineitem JOIN part ON p_partkey = l_partkey
       |      WHERE p_brand = 'Brand#2' GROUP BY 1) a ON a.ap = l_partkey
       |WHERE p_brand = 'Brand#2' AND l_quantity < 0.5 * avg_qty""".stripMargin

  /** Q19 (adapted): discounted revenue under an OR-of-ANDs predicate —
    * a pushdown/codegen stressor; part broadcasts. */
  def q19Discounted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val cond =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 10) &&
        col("l_quantity").between(5, 15)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(10, 25) &&
        col("l_quantity").between(15, 30)) ||
      (col("p_brand") === "Brand#15" && col("p_size").between(20, 40) &&
        col("l_quantity").between(25, 40))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    s"""SELECT ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
       |       count(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 5 AND 15)
       |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 15 AND 30)
       |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 25 AND 40)""".stripMargin

  /** Q22 (adapted): well-funded customers with no RECENT orders, by
    * nation. The scalar average broadcasts; the inactivity test is a
    * left-anti join against the date-pruned orders scan. */
  def q22NoOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal"), 6).as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal"), 4).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q22Sql: String =
    s"""SELECT n_name, count(*) AS numcust, ${sqlSum("c_acctbal", 4)} AS totacctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_acctbal > (SELECT ${sqlAvg("c_acctbal", 6)} FROM customer WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |                  AND o_orderdate >= TIMESTAMP '2000-06-01')
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
