package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated test tables.
  *
  * Every table is a plain parquet file under `sfDir`; loaders stay thin so
  * Catalyst sees the scan directly (predicate pushdown / column pruning
  * reach the parquet reader with no view indirection).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Canonicalize an `events`-shaped frame so `ts` is always session-TZ
    * TIMESTAMP, whatever encoding this testdata generation used. The
    * driver has shipped three over the rounds:
    *   - int64 nanos (read as Long under spark.sql.legacy.parquet
    *     .nanosAsLong) → truncate to µs, relabel as timestamp;
    *   - TIMESTAMP_NTZ µs (isAdjustedToUTC=false footer) → cast to
    *     TIMESTAMP; sessions pin spark.sql.session.timeZone=UTC, so the
    *     cast is a pure relabeling, no instant shift;
    *   - TIMESTAMP µs → already canonical.
    * Shared by the batch loader and the streaming source so batch and
    * stream can never disagree on event time again. */
  private[graft] def normalizeTs(df: DataFrame, col: String = "ts"): DataFrame =
    df.schema(col).dataType match {
      case LongType =>
        df.withColumn(col, timestamp_micros(expr(s"$col div 1000")))
      case TimestampNTZType =>
        df.withColumn(col, df(col).cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
