package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-8 batch-3 operators (SURVEY §2 #284-#285): schema-on-read
  * drift monitoring over the events feed's JSON `props` column.
  */
object Round8Ops {

  // ---------------------------------------------- #284 dq_schema_drift

  /** Corpus midpoint day (min + ⌊span/2⌋) — the injection's rollout
    * date. One 1-row aggregate, collected driver-side so the streaming
    * twin can inject against a literal (a stream cannot re-aggregate
    * its own history for a constant; the batch op uses the same scalar
    * so the two are bit-identical by construction). */
  private[graft] def feedMidDay(ev: DataFrame): java.sql.Date =
    // floor() explicitly: int/2 is double division in Spark and DuckDB,
    // but their double→int casts disagree (truncate vs round-half) —
    // floor first is identical in both engines
    ev.agg(date_add(min(to_date(col("ts"))),
        floor(datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) / 2)
          .cast("int")).as("mid"))
      .collect()(0).getAs[java.sql.Date](0)

  /** Deterministic drift injection (the #165/#167 self-injection
    * discipline — the synthetic feed's props schema is too clean to
    * exercise the monitor): a "beta" key rides every 11th event BEFORE
    * the midpoint day (a retired experiment), and every 7th event
    * ON/AFTER it renames "k" to "k_v2" (a producer rollout). Map-only,
    * fenced here, mirrored verbatim in the oracle; the monitor reads
    * only the injected column. */
  private[graft] def injectedProps(ev: DataFrame, mid: java.sql.Date): DataFrame = {
    val d = to_date(col("ts"))
    ev.withColumn("props2",
      when(d < lit(mid) && pmod(col("event_id"), lit(11)) === 0,
           regexp_replace(col("props"), "^\\{", "{\"beta\": 1,"))
        .when(d >= lit(mid) && pmod(col("event_id"), lit(7)) === 0,
              regexp_replace(col("props"), "\"k\"", "\"k_v2\""))
        .otherwise(col("props")))
  }

  /** Mergeable (day, key) registers: one JSON-key explode per event,
    * counts merge by addition — also the #285 streaming state. */
  private[graft] def schemaRegisters(ev: DataFrame, mid: java.sql.Date): DataFrame =
    injectedProps(ev, mid)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
              explode(json_object_keys(col("props2"))).as("key"))
      .groupBy(col("day"), col("key"))
      .agg(count(lit(1)).as("n"))

  /** Per-key lifecycle readout over the drained ≤days×keys register
    * table: first/last day seen, days present, event count, and the
    * drift verdict relative to the feed's day range — `new` (appeared
    * mid-feed: a producer rollout), `retired` (vanished mid-feed: a
    * dropped field consumers may still read), `transient`, `stable`. */
  private[graft] def schemaDriftFinalize(regs: DataFrame): DataFrame = {
    val span = regs.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    regs.groupBy(col("key"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"),
           count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
      .crossJoin(broadcast(span))
      .withColumn("status",
        when(col("first_day") > col("d0") && col("last_day") < col("d1"),
             "transient")
          .when(col("first_day") > col("d0"), "new")
          .when(col("last_day") < col("d1"), "retired")
          .otherwise("stable"))
      .select(col("key"), col("first_day"), col("last_day"),
              col("n_days"), col("n_events"), col("status"))
      .orderBy(col("key"))
  }

  /** #284 dq_schema_drift: SCHEMA-ON-READ drift over the JSON props
    * feed — which keys exist, when each appeared/vanished, and the
    * new/retired/stable verdict per key. The monitor a semi-structured
    * lake table needs that column-schema DQ (#200/#229 profile typed
    * columns) cannot see: producers add and drop JSON fields without
    * any schema change. Scale shape: one scan, map-only key explode
    * (bounded by keys-per-doc), one (day, key) rollup — trivially
    * map-side-combinable; the lifecycle readout runs over the bounded
    * register table with a broadcast 1-row span. */
  def dqSchemaDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    schemaDriftFinalize(schemaRegisters(ev, feedMidDay(ev)))
  }

  /** Oracle: identical injection (regex mirrored), DuckDB json_keys,
    * same rollup + verdicts. */
  val dqSchemaDriftSql: String =
    s"""WITH mid AS (
       |  SELECT min(CAST(ts AS DATE)) +
       |         CAST(floor(datediff('day', min(CAST(ts AS DATE)),
       |                             max(CAST(ts AS DATE))) / 2) AS INT) AS mid
       |  FROM events),
       |inj AS (
       |  SELECT ts,
       |         CASE
       |           WHEN CAST(ts AS DATE) < mid AND event_id % 11 = 0
       |             THEN regexp_replace(props, '^\\{', '{"beta": 1,')
       |           WHEN CAST(ts AS DATE) >= mid AND event_id % 7 = 0
       |             THEN regexp_replace(props, '"k"', '"k_v2"')
       |           ELSE props END AS props2
       |  FROM events CROSS JOIN mid),
       |keyed AS (
       |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       |         unnest(json_keys(props2)) AS key
       |  FROM inj),
       |regs AS (SELECT day, key, count(*) AS n FROM keyed GROUP BY 1, 2),
       |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM regs),
       |per_key AS (
       |  SELECT key, min(day) AS first_day, max(day) AS last_day,
       |         count(*) AS n_days, CAST(sum(n) AS BIGINT) AS n_events
       |  FROM regs GROUP BY 1)
       |SELECT key, first_day, last_day, n_days, n_events,
       |       CASE WHEN first_day > d0 AND last_day < d1 THEN 'transient'
       |            WHEN first_day > d0 THEN 'new'
       |            WHEN last_day < d1 THEN 'retired'
       |            ELSE 'stable' END AS status
       |FROM per_key CROSS JOIN span ORDER BY key""".stripMargin
}
