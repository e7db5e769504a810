package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._

/** Date-partitioned parquet layout (SURVEY §2 #99): Hive-style
  * `p_date=YYYY-MM-DD/` directories whose partition values live in the
  * PATH, not the files — so a date predicate prunes whole directories
  * at PLANNING time (`PartitionFilters` in the scan node) and the
  * pruned files are never opened, listed columns never decoded. This is
  * the other half of the physical-layout story next to
  * [[Bucketed]]: bucketing kills the join shuffle, date partitioning
  * kills the time-range scan — at 100 TB an un-partitioned events table
  * makes every "last week" query a full-corpus read, while a
  * daily-partitioned one reads 7/10957 directories.
  *
  * Partition granularity is a real design choice at scale: daily over
  * years → tens of thousands of directories is fine (listing is
  * metadata-cheap); per-hour × per-type double partitioning multiplies
  * directory count and shrinks files toward the small-file cliff. The
  * fixture partitions by day only and keeps `event_type` as an ordinary
  * column-statistics concern (parquet row-group min/max), which is the
  * recommended split: low-cardinality, always-filtered → directory;
  * everything else → row-group stats.
  */
object Partitioned {

  /** Write `events` once per sf dir as a daily-partitioned table
    * (idempotent across Verify runs — overwrite replaces). Dynamic
    * partition overwrite is the production backfill mode (rewrite only
    * the touched days); the initial load here is a static overwrite. */
  private[graft] def eventsPartitioned(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_part$tag/events"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      Tables.events(s, dir)
        .withColumn("p_date", date_format(col("ts"), "yyyy-MM-dd"))
        .write.partitionBy("p_date")
        .mode(SaveMode.Overwrite).parquet(path)
    }
    path
  }

  /** The pruned scan: read back the partitioned layout with a
    * partition-column predicate. Exposed for the plan-pin spec. */
  private[graft] def prunedScan(s: SparkSession, dir: String,
                                from: String, to: String): DataFrame =
    s.read.parquet(eventsPartitioned(s, dir))
      .filter(col("p_date") >= from && col("p_date") <= to)

  /** #99 events_partitioned_prune: one-week type rollup driven off the
    * partitioned layout. The `p_date` predicate is a PartitionFilter —
    * only the 7 matching directories are scanned (PlanSpec pins
    * `PartitionFilters` non-empty and partition count 7), the other ~23
    * days of files are never opened. */
  def eventsPartitionedPrune(s: SparkSession, dir: String): DataFrame =
    prunedScan(s, dir, "2024-01-08", "2024-01-14")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("sum_value"))
      .orderBy(col("event_type"))

  /** Oracle over the ORIGINAL un-partitioned table: the layout must not
    * change the answer, only the files read. */
  val eventsPartitionedPruneSql: String =
    s"""SELECT event_type, count(*) AS n,
       |       ${sqlR(sqlSum("value"), 4)} AS sum_value
       |FROM events
       |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
