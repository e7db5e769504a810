package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-14 operators (SURVEY §2 #334-#335): Poisson
  * overdispersion test on daily volumes and the shard-balance audit.
  */
object Round9Ops14 {

  // ----------------------------------- #334 events_overdispersion

  /** #334 events_overdispersion: is the per-type DAILY VOLUME Poisson?
    * Every volume monitor (#220, #228) implicitly assumes a noise
    * model; this op tests it — dispersion index D = var/mean of the
    * daily counts (Poisson ⇒ D = 1), the chi-square dispersion
    * statistic (n−1)·D, and its normal approximation
    * z = (D−1)·√((n−1)/2). Overdispersed feeds (z > 2 — bursts,
    * campaigns, retries) need negative-binomial-width alert bands;
    * underdispersed (z < −2 — rate-limited, quota-shaped) can run
    * tighter ones. The verdict column says which band model the
    * volume monitor should use.
    *
    * Scale shape: one (type, day) count rollup (map-side combinable),
    * then a ≤|types|-row moment fold — variance in one-pass moment
    * form over exact decimal sums. Days are OBSERVED days: a day with
    * zero events is indistinguishable from a day outside the feed's
    * life without a calendar spine; #328 is the op that finds holes.
    */
  def eventsOverdispersion(s: SparkSession, dir: String): DataFrame =
    overdispersionDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, ts). */
  def overdispersionDf(ev: DataFrame): DataFrame =
    overdispersionFinalize(dailyCountRegisters(ev))

  /** The (type, day) count registers — count merges by addition (the
    * #126 day-partial state class), so this IS the #338 streaming
    * state: ≤ types × days rows, calendar-bounded. */
  private[graft] def dailyCountRegisters(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))

  /** Dispersion readout over the drained (type, day, c) registers. */
  private[graft] def overdispersionFinalize(daily: DataFrame): DataFrame = {
    val n = count(lit(1)).cast("double")
    val mean = dsum(col("c")) / n
    val svar = (dsum(col("c") * col("c")) - dsum(col("c")) * dsum(col("c")) / n) /
      nullif(n - 1, lit(0d))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
           r(mean, 6).as("mean_daily"),
           r(svar, 6).as("var_daily"),
           r(svar / nullif(mean, lit(0d)), 6).as("dispersion"),
           r((svar / nullif(mean, lit(0d)) - 1) * sqrt((n - 1) / 2), 6)
             .as("z_disp"))
      .withColumn("verdict",
        when(col("z_disp").isNull, "unknown")
          .when(col("z_disp") > 2, "overdispersed")
          .when(col("z_disp") < -2, "underdispersed")
          .otherwise("poisson"))
      .orderBy(col("event_type"))
  }

  val eventsOverdispersionSql: String = {
    val n = "CAST(count(*) AS DOUBLE)"
    val mean = s"${sqlSum("c")} / $n"
    val svar = s"((${sqlSum("c * c")} - ${sqlSum("c")} * ${sqlSum("c")} / $n) / nullif($n - 1, 0.0))"
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type, count(*) AS n_days,
       |         ${sqlR(mean, 6)} AS mean_daily,
       |         ${sqlR(svar, 6)} AS var_daily,
       |         ${sqlR(s"$svar / nullif($mean, 0.0)", 6)} AS dispersion,
       |         ${sqlR(s"($svar / nullif($mean, 0.0) - 1) * sqrt(($n - 1) / 2)", 6)}
       |           AS z_disp
       |  FROM daily GROUP BY 1)
       |SELECT *, CASE WHEN z_disp IS NULL THEN 'unknown'
       |               WHEN z_disp > 2 THEN 'overdispersed'
       |               WHEN z_disp < -2 THEN 'underdispersed'
       |               ELSE 'poisson' END AS verdict
       |FROM agg ORDER BY event_type""".stripMargin
  }

  // --------------------------------------- #335 corpus_shard_skew

  /** #335 corpus_shard_skew: the BALANCE AUDIT over #91's packed
    * shards — at training time a skewed shard is a straggler (the
    * epoch runs at the speed of the fattest shard), so the packing
    * report every pipeline publishes next to the shards themselves:
    * per source, shard count, total/mean/min/max shard bytes, the
    * coefficient of variation, max/mean (the straggler factor), and
    * the share of underfull shards (< half the target — tail shards
    * plus oversized-doc fragmentation). #91 ASSIGNS, this AUDITS; the
    * pair is the write path and its acceptance check.
    *
    * Scale shape: rides #91's distributed prefix sum, then a
    * (source, shard) rollup and a ≤|sources|-row moment fold — both
    * map-side combinable, variance in one-pass moment form. */
  def corpusShardSkew(s: SparkSession, dir: String,
                      shardBytes: Long = 16384L): DataFrame =
    shardSkewDf(Curation.corpusShardPackDf(Tables.documents(s, dir),
      shardBytes), shardBytes)

  /** DataFrame-generic core over a (source, shard_id, n_bytes)
    * assignment. */
  private[graft] def shardSkewDf(packed: DataFrame,
                                 shardBytes: Long): DataFrame = {
    val shards = packed.groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("bytes"))
    val n = count(lit(1)).cast("double")
    val mean = dsum(col("bytes")) / n
    val svar = (dsum(col("bytes") * col("bytes")) -
      dsum(col("bytes")) * dsum(col("bytes")) / n) / nullif(n - 1, lit(0d))
    shards.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shards"),
           sum(col("bytes")).as("total_bytes"),
           min(col("bytes")).as("min_bytes"),
           max(col("bytes")).as("max_bytes"),
           r(mean, 6).as("mean_bytes"),
           r(sqrt(greatest(lit(0d), svar)) / nullif(mean, lit(0d)), 6).as("cv"),
           r(max(col("bytes")) / nullif(mean, lit(0d)), 6).as("straggler_factor"),
           r(sum(when(col("bytes") < shardBytes / 2, 1L).otherwise(0L))
               .cast("double") / n, 6).as("underfull_share"))
      .orderBy(col("source"))
  }

  def corpusShardSkewSql(shardBytes: Long = 16384L): String = {
    val n = "CAST(count(*) AS DOUBLE)"
    val mean = s"${sqlSum("bytes")} / $n"
    val svar = s"((${sqlSum("bytes * bytes")} - ${sqlSum("bytes")} * ${sqlSum("bytes")} / $n) / nullif($n - 1, 0.0))"
    s"""WITH packed AS (${Curation.corpusShardPackSql(shardBytes)}),
       |shards AS (
       |  SELECT source, shard_id, count(*) AS n_docs,
       |         CAST(sum(n_bytes) AS BIGINT) AS bytes
       |  FROM packed GROUP BY 1, 2)
       |SELECT source, count(*) AS n_shards,
       |       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       |       min(bytes) AS min_bytes, max(bytes) AS max_bytes,
       |       ${sqlR(mean, 6)} AS mean_bytes,
       |       ${sqlR(s"sqrt(greatest(0.0, $svar)) / nullif($mean, 0.0)", 6)} AS cv,
       |       ${sqlR(s"max(bytes) / nullif($mean, 0.0)", 6)} AS straggler_factor,
       |       ${sqlR(s"CAST(sum(CASE WHEN bytes < ${shardBytes / 2} THEN 1 ELSE 0 END) AS DOUBLE) / $n", 6)}
       |         AS underfull_share
       |FROM shards GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
