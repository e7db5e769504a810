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
    * the table, reuse it (warmup + timed bench passes, repeated Verify
    * calls). A fresh session re-writes (catalog metadata is
    * session-scoped and the layout must match the code that reads it). */
  private def writeBucketed(df: DataFrame, table: String, path: String,
                            buckets: Int, key: String): Unit = {
    val s = df.sparkSession
    if (!s.catalog.tableExists(table)) {
      df.write.format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path)
        .mode(SaveMode.Overwrite)
        .saveAsTable(table)
    }
  }

  /** Bucketed lineitem ⋈ orders on the order key (tables written on
    * first touch per sf dir), revenue rollup by priority. The join
    * carries NO Exchange on either side: both scans emit
    * hash-distributed, sorted buckets the SortMergeJoin consumes
    * directly. The post-join aggregate keys on `o_orderpriority` (not
    * the bucket key) so it re-shuffles its ≤5-row partials — the cheap
    * exchange survives, the expensive two never happen. */
  def lineitemBucketedJoin(s: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val (lt, ot) = (s"graft_li_bkt$tag", s"graft_ord_bkt$tag")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed$tag"
    writeBucketed(Tables.lineitem(s, dir), lt, s"$base/lineitem", buckets, "l_orderkey")
    writeBucketed(Tables.orders(s, dir), ot, s"$base/orders", buckets, "o_orderkey")
    s.table(lt).join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
           dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val lineitemBucketedJoinSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |       ${sqlR(sqlSum("l_extendedprice * (1 - l_discount)"), 2)} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
