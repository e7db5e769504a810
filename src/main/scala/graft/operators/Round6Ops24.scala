package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Round-6 batch-41 operators (SURVEY §2 #266-#267): the end-to-end
  * corpus disposition gate and the per-user feature-store export.
  */
object Round6Ops24 {

  // ------------------------------------------------ #266 corpus_disposition

  /** Routing thresholds (each screen's own published constant). */
  val DispMinTokens = 10
  val DispMinQuality = 0.35

  /** #266 corpus_disposition: the FINAL ROUTING GATE — every document
    * assigned exactly one disposition by a fixed priority chain over
    * the screen family: drop_short (< [[DispMinTokens]] tokens) →
    * drop_garbage (#222) → route_code (#224) → route_instruction
    * (#231) → drop_low_quality (#22 < [[DispMinQuality]]) →
    * keep_prose; rolled up per (source, route) with source and corpus
    * shares. This is the decision table a curation run PUBLISHES —
    * the individual screens say what a doc looks like; the gate says
    * what HAPPENS to it, with first-match-wins priority so double-
    * flagged docs (garbled code) route deterministically.
    *
    * Scale shape: every score is the screen's own map-only expression
    * evaluated in ONE shared scan (no joins between screens), one
    * (source, route) rollup, shares as windows over the bounded
    * table. */
  def corpusDisposition(s: SparkSession, dir: String): DataFrame =
    corpusDispositionDf(Tables.documents(s, dir))

  /** DataFrame-generic core: expects (doc_id, source, text). */
  def corpusDispositionDf(docs: DataFrame): DataFrame =
    dispositionFinalize(dispositionRegisters(docs))

  /** Mergeable (source, route) registers — the route decision is a
    * map-only first-match expression per arriving doc, the counters
    * merge by addition, so this stage is also the #280 streaming
    * state (SURVEY §5 registers/finalize contract). */
  private[graft] def dispositionRegisters(docs: DataFrame): DataFrame = {
    val route =
      when(size(lowerTokens(col("text"))) < DispMinTokens, "drop_short")
        .when(Round6Ops12.garbageScoreCol > Round6Ops12.GarbageThreshold,
              "drop_garbage")
        .when(Round6Ops12.codeScoreCol > Round6Ops12.CodeThreshold,
              "route_code")
        .when(Round6Ops14.instructionScoreCol >
                Round6Ops14.InstructionThreshold, "route_instruction")
        .when(TextOps.qualityCol < DispMinQuality, "drop_low_quality")
        .otherwise("keep_prose")
    docs
      .select(col("source"), route.as("route"),
              size(lowerTokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"), col("route"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }

  /** Share readout over the drained ≤|sources|×6 register table. */
  private[graft] def dispositionFinalize(g: DataFrame): DataFrame = {
    val wSrc = Window.partitionBy(col("source"))
    val wAll = Window.partitionBy()
    g.withColumn("src_share",
        r(col("n_docs") / sum(col("n_docs")).over(wSrc).cast("double"), 6))
      .withColumn("corpus_share",
        r(col("n_docs") / sum(col("n_docs")).over(wAll).cast("double"), 6))
      .orderBy(col("source"), col("route"))
  }

  val corpusDispositionSql: String = {
    val route =
      s"""CASE WHEN len(string_split(lower(trim(text)), ' ')) < $DispMinTokens
         |       THEN 'drop_short'
         |     WHEN (${Round6Ops12.garbageScoreSqlFrag}) >
         |            ${Round6Ops12.GarbageThreshold} THEN 'drop_garbage'
         |     WHEN (${Round6Ops12.codeScoreSqlFrag}) >
         |            ${Round6Ops12.CodeThreshold} THEN 'route_code'
         |     WHEN (${Round6Ops14.instructionScoreSqlFrag}) >
         |            ${Round6Ops14.InstructionThreshold}
         |       THEN 'route_instruction'
         |     WHEN (${TextOps.qualitySqlFrag}) < $DispMinQuality
         |       THEN 'drop_low_quality'
         |     ELSE 'keep_prose' END""".stripMargin
    s"""WITH routed AS (
       |  SELECT source, $route AS route,
       |         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
       |           AS n_tok
       |  FROM documents),
       |g AS (
       |  SELECT source, route, count(*) AS n_docs,
       |         CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |  FROM routed GROUP BY 1, 2)
       |SELECT source, route, n_docs, n_tokens,
       |       ${sqlR("n_docs / CAST(sum(n_docs) OVER (PARTITION BY source) AS DOUBLE)", 6)}
       |         AS src_share,
       |       ${sqlR("n_docs / CAST(sum(n_docs) OVER () AS DOUBLE)", 6)}
       |         AS corpus_share
       |FROM g ORDER BY source, route""".stripMargin
  }

  // ------------------------------------------------ #267 user_feature_vector

  /** #267 user_feature_vector: the FEATURE-STORE EXPORT — one wide row
    * per user assembling the behavioral features this library already
    * computes into the table an ML training job reads: activity volume
    * and span, events per day, type-mix entropy (#122's diversity
    * signal), weekly-rhythm flatness and crowd-cosine (#255), purchase
    * rate, and the mean event value. Each feature keeps its source
    * operator's exact arithmetic, so the export is consistent with
    * every dashboard built on the same numbers — the point of a
    * feature store.
    *
    * Scale shape: ONE user-keyed aggregation computes volume/span/
    * purchase features; entropy and rhythm reuse their ops' bounded
    * shapes; everything joins co-keyed on user_id (one shuffle family)
    * — no windows over raw events beyond the sources' own. */
  def userFeatureVector(s: SparkSession, dir: String): DataFrame =
    userFeatureVectorDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_id,
    * event_type, value). */
  def userFeatureVectorDf(ev: DataFrame): DataFrame = {
    val base = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           (datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
             .cast("long").as("span_days"),
           r(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) /
             count(lit(1)).cast("double"), 6).as("purchase_rate"),
           davg(col("value"), 6).as("mean_value"))
      .withColumn("events_per_day",
        r(col("n_events") / col("span_days").cast("double"), 6))
    val entropy = Round6Ops.eventsTypeEntropyDf(ev)
      .select(col("user_id"), col("entropy").as("type_entropy"))
    val rhythm = Round6Ops20.eventsRhythmProfileDf(ev)
      .select(col("user_id"), col("cosine_global").as("rhythm_cosine"),
              col("norm_entropy").as("rhythm_flatness"))
    base
      .join(entropy, Seq("user_id"))
      .join(rhythm, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("span_days"),
              col("events_per_day"), col("purchase_rate"), col("mean_value"),
              col("type_entropy"), col("rhythm_cosine"),
              col("rhythm_flatness"))
      .orderBy(col("user_id"))
  }

  def userFeatureVectorSql(entropySql: String, rhythmSql: String): String =
    s"""WITH base AS (
       |  SELECT user_id, count(*) AS n_events,
       |         CAST(datediff('day', min(CAST(ts AS DATE)),
       |                       max(CAST(ts AS DATE))) + 1 AS BIGINT)
       |           AS span_days,
       |         ${sqlR("sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |           AS purchase_rate,
       |         ${sqlAvg("value", 6)} AS mean_value
       |  FROM events GROUP BY 1),
       |ent AS (SELECT user_id, entropy AS type_entropy FROM ($entropySql)),
       |rhy AS (SELECT user_id, cosine_global AS rhythm_cosine,
       |               norm_entropy AS rhythm_flatness
       |        FROM ($rhythmSql))
       |SELECT b.user_id, b.n_events, b.span_days,
       |       ${sqlR("b.n_events / CAST(b.span_days AS DOUBLE)", 6)}
       |         AS events_per_day,
       |       b.purchase_rate, b.mean_value,
       |       ent.type_entropy, rhy.rhythm_cosine, rhy.rhythm_flatness
       |FROM base b JOIN ent USING (user_id) JOIN rhy USING (user_id)
       |ORDER BY b.user_id""".stripMargin
}
