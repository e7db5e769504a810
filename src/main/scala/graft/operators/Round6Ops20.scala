package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-37 operators (SURVEY §2 #254-#257): the multimodal
  * resolution audit, behavioral rhythm profiles, value-granularity DQ,
  * and conversion by session depth.
  */
object Round6Ops20 {

  // ------------------------------------------------ #254 mm_resolution_audit

  /** Minimum training resolution (pixels per side). */
  val MmResFloor = 256

  /** #254 mm_resolution_audit: the RESOLUTION/GEOMETRY audit of the
    * multimodal corpus — per modality (the #219 stub assignment):
    * counts, megapixel mean, the share below the [[MmResFloor]]
    * training floor, and the orientation mix (portrait/landscape/
    * square). The intake gate a vision pipeline runs before spending
    * decode budget: below-floor images waste augmentation, extreme
    * aspect ratios break fixed-size batching (#157's length buckets,
    * for pixels), and an orientation mix shift signals a new source
    * type. Geometry comes from the #33 ingest metadata — the audit
    * never touches payloads.
    *
    * Scale shape: map-only metadata projection, one modality rollup —
    * ≤4 rows out, no decode, no shuffle beyond the groupBy. */
  def mmResolutionAudit(s: SparkSession, dir: String): DataFrame = {
    val modality = element_at(
      array(lit("text"), lit("image"), lit("audio"), lit("video")),
      (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2),
            16, 10).cast("int") % 4 + 1))
    val w = lit(64) + col("doc_id") % 960
    val h = lit(64) + (col("doc_id") * 7) % 960
    Tables.documents(s, dir)
      .select(modality.as("modality"), w.as("w"), h.as("h"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
           r(dsum(col("w") * col("h") / lit(1e6)) / count(lit(1)), 6)
             .as("mean_mpix"),
           r(sum(when(col("w") < MmResFloor || col("h") < MmResFloor, 1L)
                   .otherwise(0L)) / count(lit(1)).cast("double"), 6)
             .as("below_floor_share"),
           sum(when(col("w") > col("h"), 1L).otherwise(0L)).as("n_landscape"),
           sum(when(col("w") < col("h"), 1L).otherwise(0L)).as("n_portrait"),
           sum(when(col("w") === col("h"), 1L).otherwise(0L)).as("n_square"),
           min(least(col("w"), col("h"))).cast("long").as("min_side"),
           max(greatest(col("w"), col("h"))).cast("long").as("max_side"))
      .orderBy(col("modality"))
  }

  val mmResolutionAuditSql: String =
    s"""WITH g AS (
       |  SELECT CASE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT % 4
       |           WHEN 0 THEN 'text' WHEN 1 THEN 'image'
       |           WHEN 2 THEN 'audio' ELSE 'video' END AS modality,
       |         64 + doc_id % 960 AS w,
       |         64 + (doc_id * 7) % 960 AS h
       |  FROM documents)
       |SELECT modality, count(*) AS n,
       |       ${sqlR(s"(${sqlSum("w * h / 1e6")}) / count(*)", 6)} AS mean_mpix,
       |       ${sqlR(s"sum(CASE WHEN w < $MmResFloor OR h < $MmResFloor THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |         AS below_floor_share,
       |       CAST(sum(CASE WHEN w > h THEN 1 ELSE 0 END) AS BIGINT) AS n_landscape,
       |       CAST(sum(CASE WHEN w < h THEN 1 ELSE 0 END) AS BIGINT) AS n_portrait,
       |       CAST(sum(CASE WHEN w = h THEN 1 ELSE 0 END) AS BIGINT) AS n_square,
       |       CAST(min(least(w, h)) AS BIGINT) AS min_side,
       |       CAST(max(greatest(w, h)) AS BIGINT) AS max_side
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------- #255 events_rhythm_profile

  /** #255 events_rhythm_profile: each user's WEEKLY RHYTHM — the 7-bin
    * day-of-week activity profile compared to the corpus profile
    * (cosine) and scored for flatness (normalized profile entropy).
    * The behavioral-shape feature beside #145's velocity screens and
    * #122's type entropy: humans have weekly rhythm (work-day or
    * weekend skew — high cosine to the crowd, entropy < 1), schedulers
    * and bots are FLAT (entropy ≈ 1) or run on alien schedules (low
    * cosine). Both numbers are per-row algebra over 7 fixed bins, so
    * thresholds transfer across corpus sizes.
    *
    * Scale shape: one (user, dow) conditional rollup to 7 columns per
    * user; the corpus profile is a broadcast 1-row aggregate; cosine/
    * entropy are fixed-order 7-term expressions — no windows, one
    * shuffle on the user key. */
  def eventsRhythmProfile(s: SparkSession, dir: String): DataFrame =
    eventsRhythmProfileDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts). */
  def eventsRhythmProfileDf(ev: DataFrame): DataFrame = {
    val dowed = ev.select(col("user_id"), dayofweek(col("ts")).as("dow"))
    def cnts(dfCol: Column): Seq[Column] =
      (1 to 7).map(d => sum(when(dfCol === d, 1L).otherwise(0L)).as(s"c$d"))
    val uaggs = count(lit(1)).as("n") +: cnts(col("dow"))
    val user = dowed.groupBy(col("user_id")).agg(uaggs.head, uaggs.tail: _*)
    val global = dowed.agg(count(lit(1)).as("gn"),
      (1 to 7).map(d => sum(when(col("dow") === d, 1L).otherwise(0L))
        .as(s"g$d")): _*)
    def p(d: Int) = r(col(s"c$d") / col("n").cast("double"), 6)
    def g(d: Int) = r(col(s"g$d") / col("gn").cast("double"), 6)
    val dot = (1 to 7).map(d => p(d) * g(d)).reduce(_ + _)
    val np = sqrt((1 to 7).map(d => p(d) * p(d)).reduce(_ + _))
    val ng = sqrt((1 to 7).map(d => g(d) * g(d)).reduce(_ + _))
    val ent = (1 to 7).map { d =>
      when(p(d) > 0, -p(d) * r(log(p(d)), 6)).otherwise(lit(0.0))
    }.reduce(_ + _)
    val ln7 = r(log(lit(7.0)), 6)
    user.crossJoin(broadcast(global))
      .withColumn("cosine_global",
        when(np > 0 && ng > 0, r(dot / (np * ng), 6)).otherwise(lit(0.0)))
      .withColumn("norm_entropy", r(ent / ln7, 6))
      .withColumn("is_flat", col("norm_entropy") > 0.98)
      .withColumn("is_deviant", col("cosine_global") < 0.8)
      .select(col("user_id"), col("n"), col("cosine_global"),
              col("norm_entropy"), col("is_flat"), col("is_deviant"))
      .orderBy(col("user_id"))
  }

  val eventsRhythmProfileSql: String = {
    val p = (d: Int) => sqlR(s"c$d / CAST(n AS DOUBLE)", 6)
    val g = (d: Int) => sqlR(s"g$d / CAST(gn AS DOUBLE)", 6)
    val dot = (1 to 7).map(d => s"(${p(d)}) * (${g(d)})").mkString(" + ")
    val np = "sqrt(" + (1 to 7).map(d => s"(${p(d)}) * (${p(d)})")
      .mkString(" + ") + ")"
    val ng = "sqrt(" + (1 to 7).map(d => s"(${g(d)}) * (${g(d)})")
      .mkString(" + ") + ")"
    val ent = (1 to 7).map { d =>
      s"(CASE WHEN (${p(d)}) > 0 THEN -(${p(d)}) * (${sqlR(s"ln(${p(d)})", 6)}) ELSE 0.0 END)"
    }.mkString(" + ")
    val ucols = (1 to 7).map(d =>
      s"CAST(sum(CASE WHEN dow = $d THEN 1 ELSE 0 END) AS BIGINT) AS c$d")
      .mkString(",\n         ")
    val gcols = (1 to 7).map(d =>
      s"CAST(sum(CASE WHEN dow = $d THEN 1 ELSE 0 END) AS BIGINT) AS g$d")
      .mkString(",\n         ")
    s"""WITH dowed AS (
       |  SELECT user_id, dayofweek(ts) + 1 AS dow FROM events),
       |u AS (
       |  SELECT user_id, count(*) AS n,
       |         $ucols
       |  FROM dowed GROUP BY 1),
       |gl AS (
       |  SELECT count(*) AS gn,
       |         $gcols
       |  FROM dowed)
       |SELECT user_id, n,
       |       CASE WHEN ($np) > 0 AND ($ng) > 0
       |         THEN ${sqlR(s"($dot) / (($np) * ($ng))", 6)}
       |         ELSE 0.0 END AS cosine_global,
       |       ${sqlR(s"($ent) / (${sqlR("ln(7.0)", 6)})", 6)} AS norm_entropy,
       |       (${sqlR(s"($ent) / (${sqlR("ln(7.0)", 6)})", 6)}) > 0.98 AS is_flat,
       |       (CASE WHEN ($np) > 0 AND ($ng) > 0
       |         THEN ${sqlR(s"($dot) / (($np) * ($ng))", 6)}
       |         ELSE 0.0 END) < 0.8 AS is_deviant
       |FROM u CROSS JOIN gl ORDER BY user_id""".stripMargin
  }

  // --------------------------------------------- #256 dq_value_granularity

  /** #256 dq_value_granularity: the VALUE-GRANULARITY audit — per event
    * type, how many decimal places the metric actually uses (exact at
    * 0/1/2/4 decimals within a 1e-6·10^d tolerance band, else
    * "fine"), with the 2dp share a money-typed feed should hold at
    * ~1.0. The quantization drift #200's min/max/mean cannot see: an
    * upstream that silently switches from cents to float (2dp share
    * collapses), a sensor that starts emitting quantized readings, or
    * a unit change that moves mass between decimal classes — all land
    * here first.
    *
    * Scale shape: per-row CASE classification (map-only), one type
    * rollup to ≤|types| rows. */
  def dqValueGranularity(s: SparkSession, dir: String): DataFrame =
    dqValueGranularityDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, value). */
  def dqValueGranularityDf(ev: DataFrame): DataFrame = {
    def exactAt(d: Int): Column = {
      val m = math.pow(10, d)
      abs(col("value") * m - round(col("value") * m)) < lit(1e-6) * m
    }
    val cls = when(exactAt(0), "d0").when(exactAt(1), "d1")
      .when(exactAt(2), "d2").when(exactAt(4), "d4").otherwise("fine")
    ev.select(col("event_type"), cls.as("cls"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("cls") === "d0", 1L).otherwise(0L)).as("n_d0"),
           sum(when(col("cls") === "d1", 1L).otherwise(0L)).as("n_d1"),
           sum(when(col("cls") === "d2", 1L).otherwise(0L)).as("n_d2"),
           sum(when(col("cls") === "d4", 1L).otherwise(0L)).as("n_d4"),
           sum(when(col("cls") === "fine", 1L).otherwise(0L)).as("n_fine"))
      .withColumn("share_2dp_or_coarser",
        r((col("n_d0") + col("n_d1") + col("n_d2")) /
          col("n").cast("double"), 6))
      .orderBy(col("event_type"))
  }

  val dqValueGranularitySql: String = {
    def exactAt(d: Int): String = {
      val m = s"1e$d"
      s"abs(value * $m - round(value * $m)) < 1e-6 * $m"
    }
    s"""WITH c AS (
       |  SELECT event_type,
       |         CASE WHEN ${exactAt(0)} THEN 'd0'
       |              WHEN ${exactAt(1)} THEN 'd1'
       |              WHEN ${exactAt(2)} THEN 'd2'
       |              WHEN ${exactAt(4)} THEN 'd4'
       |              ELSE 'fine' END AS cls
       |  FROM events)
       |SELECT event_type, count(*) AS n,
       |       CAST(sum(CASE WHEN cls = 'd0' THEN 1 ELSE 0 END) AS BIGINT) AS n_d0,
       |       CAST(sum(CASE WHEN cls = 'd1' THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
       |       CAST(sum(CASE WHEN cls = 'd2' THEN 1 ELSE 0 END) AS BIGINT) AS n_d2,
       |       CAST(sum(CASE WHEN cls = 'd4' THEN 1 ELSE 0 END) AS BIGINT) AS n_d4,
       |       CAST(sum(CASE WHEN cls = 'fine' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_fine,
       |       ${sqlR("(sum(CASE WHEN cls = 'd0' THEN 1 ELSE 0 END) + sum(CASE WHEN cls = 'd1' THEN 1 ELSE 0 END) + sum(CASE WHEN cls = 'd2' THEN 1 ELSE 0 END)) / CAST(count(*) AS DOUBLE)", 6)}
       |         AS share_2dp_or_coarser
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------ #257 events_session_depth_conversion

  /** Depth buckets the conversion curve is read at. */
  val DepthCap = 10

  /** #257 events_session_depth_conversion: CONVERSION BY SESSION DEPTH
    * — within #16-rule sessions, each event's position (capped at
    * [[DepthCap]]+), and per depth: event count, purchase share, and
    * the share of sessions that reach the depth at all. The
    * engagement-curve read between #20b's fixed funnel and #196's
    * lag: does purchase probability RISE with depth (browse-then-buy)
    * or FALL (friction), and where does session attrition bite —
    * the number a ranking/pagination change is graded on.
    *
    * Scale shape: the #16 session windows (per-user, bounded), a
    * per-session position window (bounded by session length), one
    * depth rollup to ≤[[DepthCap]]+1 rows. */
  def eventsSessionDepthConversion(s: SparkSession, dir: String): DataFrame =
    eventsSessionDepthConversionDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_id,
    * event_type). */
  def eventsSessionDepthConversionDf(ev: DataFrame): DataFrame = {
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
             unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L,
             1).otherwise(0))
      .withColumn("session_id",
        sum(col("brk")).over(wUser.rowsBetween(Window.unboundedPreceding,
                                               Window.currentRow)))
    val wSess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val depthed = sess
      .withColumn("pos", row_number().over(wSess))
      .withColumn("depth",
        when(col("pos") >= DepthCap, lit(DepthCap.toLong))
          .otherwise(col("pos").cast("long")))
    val nSessions = depthed.filter(col("pos") === 1)
      .agg(count(lit(1)).as("n_sessions"))
    depthed.groupBy(col("depth"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id"), col("session_id"))
             .as("n_sessions_reaching"),
           sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
             .as("n_purchases"))
      .crossJoin(broadcast(nSessions))
      .withColumn("purchase_share",
        r(col("n_purchases") / col("n_events").cast("double"), 6))
      .withColumn("reach_share",
        r(col("n_sessions_reaching") / col("n_sessions").cast("double"), 6))
      .select(col("depth"), col("n_events"), col("n_sessions_reaching"),
              col("n_purchases"), col("purchase_share"), col("reach_share"))
      .orderBy(col("depth"))
  }

  val eventsSessionDepthConversionSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
       |         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
       |                OR floor(epoch(CAST(ts AS TIMESTAMP))) -
       |                   floor(epoch(lag(CAST(ts AS TIMESTAMP)) OVER w)) > 1800
       |              THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, event_type, ts,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged),
       |depthed AS (
       |  SELECT user_id, session_id, event_type,
       |         row_number() OVER (PARTITION BY user_id, session_id
       |                            ORDER BY ts, event_id) AS pos
       |  FROM sess),
       |caps AS (
       |  SELECT user_id, session_id, event_type,
       |         CASE WHEN pos >= $DepthCap THEN $DepthCap ELSE pos END AS depth,
       |         pos
       |  FROM depthed),
       |ns AS (SELECT count(*) AS n_sessions FROM caps WHERE pos = 1)
       |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_events,
       |       count(DISTINCT (user_id, session_id)) AS n_sessions_reaching,
       |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_purchases,
       |       ${sqlR("sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |         AS purchase_share,
       |       ${sqlR("count(DISTINCT (user_id, session_id)) / CAST(ns.n_sessions AS DOUBLE)", 6)}
       |         AS reach_share
       |FROM caps CROSS JOIN ns
       |GROUP BY depth, ns.n_sessions ORDER BY depth""".stripMargin
}
