package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._

/** Bucketed table source/sink (SURVEY §2 #97): hash-bucketed,
  * sort-ordered parquet tables whose layout is RECORDED in the catalog,
  * so Catalyst plans co-located joins with ZERO exchanges on either
  * side. This is the canonical 100 TB answer for a fact-to-fact join
  * that broadcast can't handle (both sides huge): pay the shuffle once
  * at write time, then every subsequent join/aggregation on the bucket
  * key is exchange-free — at 1000 executors that's the difference
  * between an all-to-all of two 100 TB tables per query and none.
  *
  * Bucket count is fixed at write time (8 here for the local fixture;
  * a real deployment sizes it to executors × a small factor) and both
  * sides MUST agree on it — mismatched counts fall back to a shuffle
  * (Spark only coalesces multiples). PlanSpec pins the exchange-free
  * shape with broadcast disabled.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted catalog table under tmp. The
    * write is the POINT of bucketing — pay the shuffle once, then every
    * join on the key is exchange-free — so it must happen once per
    * session, not once per query: if this session already registered
    * the table AND the [[Staging]] source stamp still matches, reuse it
    * (warmup + timed bench passes, repeated Verify calls). A stale
    * stamp — the source parquet regenerated under us, the failure class
    * Staging exists to prevent — drops and rewrites the table; a fresh
    * session re-writes (catalog metadata is session-scoped and the
    * layout must match the code that reads it). */
  private def writeBucketed(df: DataFrame, table: String, path: String,
                            buckets: Int, key: String, source: String): Unit = {
    val s = df.sparkSession
    if (!s.catalog.tableExists(table) || !Staging.isFresh(path, source)) {
      if (s.catalog.tableExists(table)) s.sql(s"DROP TABLE $table")
      df.write.format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path)
        .mode(SaveMode.Overwrite)
        .saveAsTable(table)
      Staging.markStaged(path, source)
    }
  }

  /** The bucketed (lineitem, orders) pair for `dir`, written on first
    * touch this session — shared by every query that joins the two
    * facts on the order key (the layout pays for itself across the
    * whole workload, not one query). */
  private[graft] def factTables(s: SparkSession, dir: String,
                                buckets: Int = 8): (DataFrame, DataFrame) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val (lt, ot) = (s"graft_li_bkt$tag", s"graft_ord_bkt$tag")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed$tag"
    writeBucketed(Tables.lineitem(s, dir), lt, s"$base/lineitem", buckets,
      "l_orderkey", s"$dir/lineitem.parquet")
    writeBucketed(Tables.orders(s, dir), ot, s"$base/orders", buckets,
      "o_orderkey", s"$dir/orders.parquet")
    (s.table(lt), s.table(ot))
  }

  /** Bucketed lineitem ⋈ orders on the order key (tables written on
    * first touch per sf dir), revenue rollup by priority. The join
    * carries NO Exchange on either side: both scans emit
    * hash-distributed, sorted buckets the SortMergeJoin consumes
    * directly. The post-join aggregate keys on `o_orderpriority` (not
    * the bucket key) so it re-shuffles its ≤5-row partials — the cheap
    * exchange survives, the expensive two never happen. */
  def lineitemBucketedJoin(s: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    val (li, o) = factTables(s, dir, buckets)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
           dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** #110 supplier_lead_time: order-to-ship latency per supplier — the
    * procurement SLA report. Rides the SAME bucketed layout as #97
    * (written once, reused by every order-key join this session): the
    * lineitem⋈orders join is exchange-free, then the per-supplier
    * rollup shuffles only its map-side partials on l_suppkey. The lead
    * distribution is decimal-exact mean + min/max + late-share (ship
    * > 60 days after order). */
  def supplierLeadTime(s: SparkSession, dir: String): DataFrame = {
    val (li, o) = factTables(s, dir)
    val lead = datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), lead.as("lead_days"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
           davg(col("lead_days").cast("double"), 4).as("mean_lead"),
           min(col("lead_days")).as("min_lead"),
           max(col("lead_days")).as("max_lead"),
           r(dsum(when(col("lead_days") > 60, 1.0).otherwise(0.0)) /
             count(lit(1)), 6).as("late_share"))
      .orderBy(col("l_suppkey"))
  }

  val supplierLeadTimeSql: String =
    s"""SELECT l_suppkey, count(*) AS n_items,
       |       ${sqlR("CAST(sum(CAST(CAST(datediff('day', o_orderdate, l_shipdate) AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) / count(*)", 4)} AS mean_lead,
       |       CAST(min(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_lead,
       |       CAST(max(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_lead,
       |       ${sqlR("CAST(sum(CAST(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60 THEN 1.0 ELSE 0.0 END AS DECIMAL(38,10))) AS DOUBLE) / count(*)", 6)} AS late_share
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val lineitemBucketedJoinSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |       ${sqlR(sqlSum("l_extendedprice * (1 - l_discount)"), 2)} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
