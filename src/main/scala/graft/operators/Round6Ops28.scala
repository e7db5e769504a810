package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-45 operators (SURVEY §2 #274-#275): the character-
  * entropy compressibility proxy and daily activity streaks.
  */
object Round6Ops28 {

  // ---------------------------------------------- #274 text_char_entropy

  /** #274 text_char_entropy: the COMPRESSIBILITY PROXY — each
    * document's character-level Shannon entropy in bits per character
    * (H/ln 2), plus the distinct-character count. The classic
    * compression-ratio filter from pretraining pipelines without a
    * codec dependency: highly repetitive text (templates, padding,
    * "aaaa…") sits near 0 bits, natural prose near ~4, and random
    * noise/base64 blobs push toward log₂|alphabet| — so BOTH filter
    * tails are one column (#24f measures token diversity; characters
    * catch sub-token repetition and binary-ish junk tokens hide).
    *
    * Scale shape: the #24f shape at character grain — explode →
    * (doc, char) counts → per-doc windows bounded by the alphabet —
    * one shuffle family keyed by doc_id, skew bounded by document
    * length. */
  def textCharEntropy(s: SparkSession, dir: String): DataFrame =
    textCharEntropyDf(Tables.documents(s, dir))

  /** DataFrame-generic core: expects (doc_id, text). */
  def textCharEntropyDf(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("doc_id")
    val p = col("c") / col("n")
    cnt.withColumn("n", sum(col("c")).over(w))
      .withColumn("n_chars_distinct", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(first(col("n")).as("n_chars"),
           first(col("n_chars_distinct")).as("n_distinct"),
           dsum(-(p * r(log(p), 6)), 6).as("entropy_nats"))
      .withColumn("bits_per_char",
        r(col("entropy_nats") / r(log(lit(2.0)), 6), 6))
      .select(col("doc_id"), col("n_chars"), col("n_distinct"),
              col("entropy_nats"), col("bits_per_char"))
      .orderBy(col("doc_id"))
  }

  val textCharEntropySql: String =
    s"""WITH cnt AS (
       |  SELECT doc_id, ch, count(*) AS c FROM (
       |    SELECT doc_id, unnest(string_split(text, '')) AS ch
       |    FROM documents)
       |  GROUP BY 1, 2),
       |tot AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_distinct
       |  FROM cnt GROUP BY 1),
       |e AS (
       |  SELECT c.doc_id, t.n AS n_chars, t.n_distinct,
       |         ${sqlSum("-((c.c / t.n) * (" + sqlR("ln(c.c / t.n)", 6) + "))", 6)}
       |           AS entropy_nats
       |  FROM cnt c JOIN tot t USING (doc_id)
       |  GROUP BY 1, 2, 3)
       |SELECT doc_id, n_chars, n_distinct, entropy_nats,
       |       ${sqlR(s"entropy_nats / (${sqlR("ln(2.0)", 6)})", 6)}
       |         AS bits_per_char
       |FROM e ORDER BY doc_id""".stripMargin

  // ------------------------------------------- #275 events_activity_streaks

  /** #275 events_activity_streaks: DAILY ACTIVITY STREAKS per user —
    * consecutive-active-day runs found by the date-islands idiom
    * (d − row_number() is constant within a run), reporting each
    * user's longest streak, streak count, active days, and whether the
    * longest run touches the feed's last day (a live streak). The
    * engagement-habit feature gamified products key retention on —
    * #262 ledgers daily flows, #269 ages cohorts; streaks measure
    * CONSISTENCY, the strongest churn predictor of the three.
    *
    * Scale shape: one distinct to (user, day), one per-user window
    * (bounded by active days), one (user, island) rollup, one per-user
    * rollup — a single user-keyed shuffle family; the feed's last day
    * is a broadcast scalar. */
  def eventsActivityStreaks(s: SparkSession, dir: String): DataFrame =
    eventsActivityStreaksDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts). */
  def eventsActivityStreaksDf(ev: DataFrame): DataFrame = {
    val ud = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val last = ud.agg(max(col("d")).as("dlast"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val islands = ud
      .withColumn("island",
        datediff(col("d"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), max(col("d")).as("streak_end"))
    islands.crossJoin(broadcast(last))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
           count(lit(1)).as("n_streaks"),
           max(col("len")).as("longest_streak"),
           max(when(col("streak_end") === col("dlast"), col("len"))
                 .otherwise(0L)).as("current_streak"))
      .withColumn("consistency",
        r(col("n_active_days") / col("n_streaks").cast("double"), 6))
      .orderBy(col("user_id"))
  }

  val eventsActivityStreaksSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       |last_ AS (SELECT max(d) AS dlast FROM ud),
       |isl AS (
       |  SELECT user_id,
       |         datediff('day', DATE '1970-01-01', d) -
       |           row_number() OVER (PARTITION BY user_id ORDER BY d) AS island,
       |         d
       |  FROM ud),
       |runs AS (
       |  SELECT user_id, island, count(*) AS len, max(d) AS streak_end
       |  FROM isl GROUP BY 1, 2)
       |SELECT user_id,
       |       CAST(sum(len) AS BIGINT) AS n_active_days,
       |       count(*) AS n_streaks,
       |       CAST(max(len) AS BIGINT) AS longest_streak,
       |       CAST(max(CASE WHEN streak_end = last_.dlast THEN len ELSE 0 END)
       |            AS BIGINT) AS current_streak,
       |       ${sqlR("sum(len) / CAST(count(*) AS DOUBLE)", 6)} AS consistency
       |FROM runs CROSS JOIN last_
       |GROUP BY user_id ORDER BY user_id""".stripMargin
}
