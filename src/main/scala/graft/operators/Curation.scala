package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Corpus-curation selection operators (SURVEY §2 #77-#79): token-budget
  * selection, weighted domain sampling, and SCD2-style value-change
  * tracking. These compose the inventory ops (#74 mix weights, #22
  * quality) into the actions a training-data pipeline actually takes:
  * pick which documents make the cut.
  */
object Curation {

  /** The #22 quality score, shared with every other quality consumer
    * (the single Spark/SQL pair lives in [[TextOps]]). */
  private def qualityCol: Column = TextOps.qualityCol

  private def qualitySqlFrag: String = TextOps.qualitySqlFrag

  /** #77 corpus_token_budget: select the highest-quality documents whose
    * total token count fits a budget — by quality THRESHOLD, not by
    * global rank. The scan aggregates per quality bucket (⌊q·100⌋, ≤101
    * rows), the cumulative-from-the-top bucket table picks the highest
    * cutoff whose running token total fits, and the selection is a
    * broadcast-threshold filter on a second scan. No global sort, no
    * global window over documents — the 100 TB shape (a rank-based fill
    * would total-order the corpus). Budget semantics: whole buckets
    * only, the boundary bucket stays out (deterministic, partial-fill
    * needs a per-doc order the threshold form deliberately avoids). */
  def corpusTokenBudget(s: SparkSession, dir: String, budget: Long = 20000): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"), col("lang"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tok"),
      qualityCol.as("quality"))
    val cutoff = tokenBudgetCutoff(tokenBudgetRegisters(Tables.documents(s, dir)), budget)
    docs.crossJoin(broadcast(cutoff))
      .filter(floor(col("quality") * 100) >= col("q_cut"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** The #77 quality-bucket table as MERGEABLE registers (doc count +
    * token sum per ⌊q·100⌋ bucket, ≤101 rows, both merge by addition) —
    * also the #283 streaming state. The single definition of the
    * bucket rollup both the batch selection and the live budget
    * decision read (shared-fragment rule, SURVEY §5). */
  private[graft] def tokenBudgetRegisters(docs: DataFrame): DataFrame =
    docs.select(
        floor(qualityCol * 100).cast("long").as("qb"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("qb"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bucket_tok"))

  /** Highest quality cutoff whose cumulative-from-the-top token total
    * fits the budget (1-row frame over the ≤101-bucket table). */
  private def tokenBudgetCutoff(buckets: DataFrame, budget: Long): DataFrame = {
    val wDesc = Window.orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("cum_tok", sum(col("bucket_tok")).over(wDesc))
      .filter(col("cum_tok") <= budget)
      .agg(min(col("qb")).as("q_cut"))
  }

  /** #283 readout: the budget DECISION table — per quality bucket, its
    * doc/token mass, the cumulative-from-the-top total, and whether the
    * bucket makes the cut. All work is over the drained ≤101-row
    * register table (the partition-less window rides a bounded input,
    * the documented exception). */
  private[graft] def tokenBudgetFinalize(budget: Long)(regs: DataFrame): DataFrame = {
    val wDesc = Window.orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = regs.withColumn("cum_tok", sum(col("bucket_tok")).over(wDesc))
    withCum.crossJoin(broadcast(tokenBudgetCutoff(regs, budget)))
      .withColumn("selected", coalesce(col("qb") >= col("q_cut"), lit(false)))
      .select(col("qb"), col("n_docs"), col("bucket_tok"), col("cum_tok"),
              col("selected"))
      .orderBy(col("qb").desc)
  }

  /** #283's oracle: the bucket table + cutoff decision relationally. */
  def streamTokenBudgetSql(budget: Long = 20000): String =
    s"""WITH docs AS (
       |  SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok,
       |         ${qualitySqlFrag} AS quality
       |  FROM documents),
       |b AS (
       |  SELECT CAST(floor(quality * 100) AS BIGINT) AS qb,
       |         count(*) AS n_docs,
       |         CAST(sum(n_tok) AS BIGINT) AS bucket_tok
       |  FROM docs GROUP BY 1),
       |c AS (
       |  SELECT *, CAST(sum(bucket_tok) OVER (ORDER BY qb DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
       |  FROM b),
       |q AS (SELECT min(qb) AS q_cut FROM c WHERE cum_tok <= $budget)
       |SELECT qb, n_docs, bucket_tok, cum_tok,
       |       coalesce(qb >= q_cut, false) AS selected
       |FROM c CROSS JOIN q ORDER BY qb DESC""".stripMargin

  def corpusTokenBudgetSql(budget: Long = 20000): String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang,
       |         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok,
       |         ${qualitySqlFrag} AS quality
       |  FROM documents),
       |buckets AS (
       |  SELECT CAST(floor(quality * 100) AS BIGINT) AS qb,
       |         CAST(sum(n_tok) AS BIGINT) AS bucket_tok
       |  FROM docs GROUP BY 1),
       |cutoff AS (
       |  SELECT min(qb) AS q_cut FROM (
       |    SELECT qb, CAST(sum(bucket_tok) OVER (ORDER BY qb DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
       |    FROM buckets)
       |  WHERE cum_tok <= $budget)
       |SELECT d.doc_id, d.lang, d.n_tok, d.quality
       |FROM docs d CROSS JOIN cutoff c
       |WHERE floor(d.quality * 100) >= c.q_cut
       |ORDER BY d.doc_id""".stripMargin

  /** #78 corpus_weighted_sample: deterministic importance resampling of
    * documents toward the #74 sqrt-temperature mixture. Per (lang,
    * source) the acceptance rate is `frac · weight/share` capped at 1
    * (upweighted small domains keep everything at small `frac`); the
    * accept decision is an md5-uniform per doc_id against that rate —
    * reproducible, seedless, and exactly the shape a 100 TB sampler
    * needs (rates from a tiny broadcast dimension, a map-only filter on
    * the fact scan). Output: per-group kept counts vs expectation. */
  def corpusWeightedSample(s: SparkSession, dir: String, frac: Double = 0.5): DataFrame = {
    val rates = Sketches.corpusMixWeights(s, dir)
      .select(col("lang"), col("source"),
              least(lit(1.0), r(lit(frac) * col("weight") / nullif(col("share"), lit(0d)), 6))
                .as("rate"))
    // md5-uniform in [0,1): top 60 bits of the doc_id hash / 2^60
    val u = expr("CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
      .cast("double") / math.pow(2, 60)
    Tables.documents(s, dir)
      .join(broadcast(rates), Seq("lang", "source"))
      .withColumn("keep", u < col("rate"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("keep"), 1)).as("n_kept"),
           r(min(col("rate")) * count(lit(1)), 2).as("n_expected"))
      .orderBy(col("lang"), col("source"))
  }

  def corpusWeightedSampleSql(frac: Double = 0.5): String =
    s"""WITH g AS (
       |  SELECT lang, source, count(*) AS n_docs,
       |         CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1, 2),
       |sh AS (
       |  SELECT lang, source, n_docs, n_tokens,
       |         CAST(n_tokens AS DOUBLE) /
       |           CAST(CAST(sum(n_tokens) OVER () AS BIGINT) AS DOUBLE) AS share
       |  FROM g),
       |wt AS (
       |  SELECT *, CAST(${sqlR("sqrt(share)", 10)} AS DECIMAL(18,10)) AS w10 FROM sh),
       |-- rate mirrors the Spark side exactly: it composes the ROUNDED
       |-- 6dp weight and share columns that corpus_mix_weights emits
       |r6 AS (
       |  SELECT lang, source, ${sqlR("share", 6)} AS s6,
       |         ${sqlR("CAST(w10 AS DOUBLE) / CAST(sum(w10) OVER () AS DOUBLE)", 6)} AS w6
       |  FROM wt),
       |rates AS (
       |  SELECT lang, source,
       |         least(1.0, ${sqlR(s"$frac * w6 / nullif(s6, 0.0)", 6)}) AS rate
       |  FROM r6),
       |probed AS (
       |  SELECT d.lang, d.source, r.rate,
       |         CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
       |           / ${math.pow(2, 60)} < r.rate AS keep
       |  FROM documents d JOIN rates r USING (lang, source))
       |SELECT lang, source, count(*) AS n_docs,
       |       count(CASE WHEN keep THEN 1 END) AS n_kept,
       |       ${sqlR("min(rate) * count(*)", 2)} AS n_expected
       |FROM probed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** #79 events_scd2: slowly-changing-dimension type-2 compaction — per
    * user, collapse the event stream into versioned segments of the
    * observed `event_type` attribute: one row per run of consecutive
    * equal values with valid_from/valid_to/is_current. Gaps-and-islands
    * by VALUE CHANGE (lag-compare → cumulative change count → group),
    * the canonical warehouse upsert-history shape; all three windows
    * share one user_id exchange. */
  def eventsScd2(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wUser = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(wOrd).isNull ||
             lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("ver", sum(col("chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("ver"))
      .agg(min(col("event_type")).as("event_type"),
           min(col("ts")).as("valid_from"),
           max(col("ts")).as("valid_to"),
           count(lit(1)).as("n_events"))
      .withColumn("is_current", col("ver") === max(col("ver")).over(wUser))
      .orderBy(col("user_id"), col("ver"))
  }

  val eventsScd2Sql: String =
    """WITH chg AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN lag(event_type, 1) OVER w IS NULL
      |                OR lag(event_type, 1) OVER w <> event_type
      |              THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ver AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver
      |  FROM chg),
      |seg AS (
      |  SELECT user_id, ver, min(event_type) AS event_type,
      |         min(ts) AS valid_from, max(ts) AS valid_to,
      |         count(*) AS n_events
      |  FROM ver GROUP BY 1, 2)
      |SELECT user_id, ver, event_type, valid_from, valid_to, n_events,
      |       ver = max(ver) OVER (PARTITION BY user_id) AS is_current
      |FROM seg ORDER BY user_id, ver""".stripMargin

  /** #106 scd2_as_of: the point-in-time lookup the SCD2 history exists
    * for — "what was every user's attribute AS OF date D?". Filters the
    * #79 segment table to versions opened on or before D and keeps each
    * user's latest (max-ver window over the per-user SEGMENTS, bounded
    * by version count, never events). On a warehouse the segment table
    * is the stored artifact, so this runs without touching the fact
    * stream; here it composes the #79 operator directly, and the oracle
    * replays the same chain + qualify. */
  def scd2AsOf(s: SparkSession, dir: String,
               asOf: String = "2024-01-15 00:00:00"): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ver").desc)
    eventsScd2(s, dir)
      .filter(col("valid_from") <= lit(asOf).cast("timestamp"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ver"), col("event_type"),
              col("valid_from"), col("n_events"))
      .orderBy(col("user_id"))
  }

  def scd2AsOfSql(asOf: String = "2024-01-15 00:00:00"): String =
    s"""WITH chg AS (
       |  SELECT user_id, ts, event_id, event_type,
       |         CASE WHEN lag(event_type, 1) OVER w IS NULL
       |                OR lag(event_type, 1) OVER w <> event_type
       |              THEN 1 ELSE 0 END AS chg
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |ver AS (
       |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver
       |  FROM chg),
       |seg AS (
       |  SELECT user_id, ver, min(event_type) AS event_type,
       |         min(ts) AS valid_from, count(*) AS n_events
       |  FROM ver GROUP BY 1, 2)
       |SELECT user_id, ver, event_type, valid_from, n_events FROM (
       |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ver DESC) AS rn
       |  FROM seg WHERE valid_from <= TIMESTAMP '$asOf')
       |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------------- dup inflation

  /** #90 `doc_dup_inflation`: per-source duplication telemetry — how
    * much of each source's TOKEN budget is exact-duplicate content. The
    * dedup decision (#25's keep-min-id rule on the normalized
    * fingerprint) is weighted by whitespace token counts, answering the
    * question a mixture designer actually asks: not "how many dup docs"
    * but "how many redundant tokens am I paying for per source".
    *
    * Scale shape: one fingerprint groupBy (linear, partial-agg) and a
    * co-keyed join back on fp — the same exchange key, no second
    * shuffle of consequence; the source rollup aggregates a handful of
    * rows. Token counting is map-side. */
  def docDupInflation(s: SparkSession, dir: String): DataFrame =
    docDupInflationDf(Tables.documents(s, dir))

  /** Core: expects canonical (doc_id, source, text). */
  def docDupInflationDf(docs: DataFrame): DataFrame = {
    val base = docs.select(
      col("doc_id"), col("source"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
      size(graft.functions.TextFunctions.lowerTokens(col("text")))
        .cast("long").as("n_tokens"))
    val keep = base.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    base.join(keep, "fp")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
             .as("n_dup_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           sum(when(col("doc_id") =!= col("keep_id"), col("n_tokens"))
                 .otherwise(0L)).as("dup_tokens"))
      .withColumn("dup_token_share",
        r(col("dup_tokens").cast("double") / col("total_tokens"), 6))
      .orderBy(col("source"))
  }

  /** #91 `corpus_shard_pack`: assign documents to fixed-byte output
    * shards in (source, doc_id) order — the shard-packing step every
    * large training pipeline runs before writing tar/parquet shards. A
    * document starts a new shard when the running byte total of its
    * source crosses a multiple of `shardBytes` (greedy sequential
    * packing; oversized docs own their span).
    *
    * Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: the
    * running total per source is computed as (a) a bucket-local cumsum
    * over windows of ≤ `bucketDocs` docs (bucket = doc_id div
    * bucketDocs, ordered by construction), plus (b) a per-source
    * running offset over the BUCKET AGGREGATE — a table bounded by
    * docs/bucketDocs rows, joined back broadcast. No partition ever
    * holds a whole source (the shape the cmsTopK review flagged);
    * every stage is either bounded-window or tiny. The shard id
    * depends only on (source, doc_id, n_bytes), so the result is
    * independent of physical partitioning — which is what makes the
    * plain single-window SQL replay a valid oracle. */
  def corpusShardPack(s: SparkSession, dir: String,
                      shardBytes: Long = 16384L,
                      bucketDocs: Long = 1000L): DataFrame =
    corpusShardPackDf(Tables.documents(s, dir), shardBytes, bucketDocs)

  def corpusShardPackDf(docs: DataFrame, shardBytes: Long = 16384L,
                        bucketDocs: Long = 1000L): DataFrame = {
    val sized = docs.select(col("doc_id"), col("source"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
      (col("doc_id") / lit(bucketDocs)).cast("long").as("bkt"))
    val wLocal = Window.partitionBy("source", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sized.withColumn("cum_local", sum(col("n_bytes")).over(wLocal))
    val wBkt = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_bytes")).as("bkt_bytes"))
      .withColumn("offset",
        coalesce(sum(col("bkt_bytes")).over(wBkt), lit(0L)))
      .select(col("source"), col("bkt"), col("offset"))
    local.join(graft.Hints.keyDim(offsets), Seq("source", "bkt"))
      .select(col("doc_id"), col("source"), col("n_bytes"),
        ((col("offset") + col("cum_local") - col("n_bytes")) / shardBytes)
          .cast("long").as("shard_id"),
        (col("offset") + col("cum_local") - col("n_bytes")).as("shard_offset"))
  }

  def corpusShardPackSql(shardBytes: Long = 16384L): String =
    s"""WITH sized AS (
       |  SELECT doc_id, source,
       |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
       |  FROM documents
       |),
       |packed AS (
       |  SELECT doc_id, source, n_bytes,
       |         CAST(sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |              ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_bytes AS start_off
       |  FROM sized
       |)
       |SELECT doc_id, source, n_bytes,
       |       CAST(floor(start_off / $shardBytes) AS BIGINT) AS shard_id,
       |       start_off AS shard_offset
       |FROM packed""".stripMargin

  val docDupInflationSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, source,
       |         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
       |         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |),
       |keep AS (SELECT fp, min(doc_id) AS keep_id FROM base GROUP BY 1)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |       CAST(sum(CASE WHEN doc_id <> keep_id THEN n_tokens ELSE 0 END) AS BIGINT) AS dup_tokens,
       |       ${sqlR("CAST(sum(CASE WHEN doc_id <> keep_id THEN n_tokens ELSE 0 END) AS DOUBLE) / sum(n_tokens)", 6)} AS dup_token_share
       |FROM base JOIN keep USING (fp)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- #128 corpus_dedup_funnel

  /** #128 corpus_dedup_funnel: the END-TO-END dedup pipeline survival
    * report — per source, how many documents survive each successive
    * pass: exact fingerprint dedup (#25, keep the min doc_id per
    * normalized-text group) → MinHash near-dup (#27, a single-pass
    * keep-first rule: a doc is dropped when a verified τ-pair links it
    * to a LOWER-id doc that survived the exact pass) → semantic dedup
    * (#31f, the SemDeDup kept flag on the doc's embedding). The
    * composition report every corpus-curation run publishes ("N in, M
    * out, here's where they went").
    *
    * Each pass is the already-scale-shaped operator (fingerprint
    * groupBy, banded bucket join, cluster-blocked pruning); the funnel
    * adds only semi/anti joins on doc ids and ONE bounded per-source
    * rollup. The near-dup rule is the deterministic single-pass form
    * (no transitive closure — #42 dedup_clusters covers the
    * connected-component variant). */
  def corpusDedupFunnel(s: SparkSession, dir: String,
                        tau: Double = 0.3): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val exSurv = TextOps.dedupExact(s, dir)
      .select(col("keep_id").as("doc_id")).withColumn("ex", lit(1))
    val flagged = docs.join(exSurv, Seq("doc_id"), "left")
    // near-dup drops: τ-verified pairs whose BOTH endpoints survived
    // exact; the higher id (id_b — pairs are emitted id_a < id_b) drops
    val pairs = LshDedup.dedupMinhash(s, dir, tau)
    val exIds = exSurv.select(col("doc_id"))
    val nearDrop = pairs
      .join(exIds.withColumnRenamed("doc_id", "id_a"), Seq("id_a"))
      .join(exIds.withColumnRenamed("doc_id", "id_b"), Seq("id_b"))
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("nd", lit(1))
    val semDrop = Similarity.embSemanticDedup(s, dir)
      .filter(!col("kept"))
      .select(col("vec_id").as("doc_id")).withColumn("sd", lit(1))
    flagged
      .join(nearDrop, Seq("doc_id"), "left")
      .join(semDrop, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("ex") === 1, 1L).otherwise(0L)).as("n_after_exact"),
           sum(when(col("ex") === 1 && col("nd").isNull, 1L).otherwise(0L))
             .as("n_after_near"),
           sum(when(col("ex") === 1 && col("nd").isNull && col("sd").isNull, 1L)
                 .otherwise(0L)).as("n_after_semantic"))
      .withColumn("retention",
        r(col("n_after_semantic").cast("double") / col("n_docs"), 6))
      .orderBy(col("source"))
  }

  /** Oracle: the three passes' own oracle SQLs composed as subqueries
    * (DuckDB supports WITH inside a parenthesized subquery), then the
    * identical flag/rollup logic. */
  def corpusDedupFunnelSql(tau: Double = 0.3): String =
    s"""WITH ex AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM documents
       |  GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
       |mh AS (SELECT id_a, id_b FROM (
       |${LshDedup.dedupMinhashSql(tau)}
       |) mhq),
       |nd AS (
       |  SELECT DISTINCT m.id_b AS doc_id
       |  FROM mh m
       |  JOIN ex a ON m.id_a = a.doc_id
       |  JOIN ex b ON m.id_b = b.doc_id),
       |sd AS (SELECT vec_id AS doc_id FROM (
       |${Similarity.embSemanticDedupSql()}
       |) semq WHERE NOT kept)
       |SELECT d.source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_after_exact,
       |       CAST(sum(CASE WHEN e.doc_id IS NOT NULL AND n.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_after_near,
       |       CAST(sum(CASE WHEN e.doc_id IS NOT NULL AND n.doc_id IS NULL AND s.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_after_semantic,
       |       ${sqlR("CAST(sum(CASE WHEN e.doc_id IS NOT NULL AND n.doc_id IS NULL AND s.doc_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS retention
       |FROM documents d
       |LEFT JOIN ex e ON d.doc_id = e.doc_id
       |LEFT JOIN nd n ON d.doc_id = n.doc_id
       |LEFT JOIN sd s ON d.doc_id = s.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- #157 corpus_length_buckets

  /** #157 corpus_length_buckets: the LENGTH-BUCKETED BATCHING table —
    * documents assigned to power-of-two token-length buckets (the
    * standard bucketing a training loader uses so sequences of similar
    * length batch together), reporting per bucket the document count,
    * real tokens, padded slots (bucket ceiling × docs) and the padding
    * waste ratio. The sum over this table vs padding everything to the
    * global max is the throughput case for bucketed batching — the
    * padding-efficiency audit run before a tokenized corpus ships to
    * the trainer.
    *
    * Scale shape: pure map-side arithmetic (the bucket ceiling is
    * integer bit-math — length of the binary form, no float log2 whose
    * last-ulp could flip a power-of-two boundary) into one bounded
    * rollup (≤ log₂(max tokens) rows). One scan, one tiny shuffle. */
  def corpusLengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n_tok"))
    docs
      .withColumn("bucket_max",
        when(col("n_tok") <= 1, lit(1L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), length(bin(n_tok - 1)))")))
      .groupBy(col("bucket_max"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .withColumn("padded_slots", col("bucket_max") * col("n_docs"))
      .withColumn("waste_ratio",
        r(lit(1.0) - col("total_tokens").cast("double") /
          col("padded_slots").cast("double"), 6))
      .orderBy(col("bucket_max"))
  }

  val corpusLengthBucketsSql: String =
    s"""WITH docs AS (
       |  SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents),
       |b AS (
       |  SELECT n_tok,
       |         CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT)
       |              ELSE (CAST(1 AS BIGINT) << length(bin(n_tok - 1))) END AS bucket_max
       |  FROM docs)
       |SELECT bucket_max, count(*) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       |       CAST(bucket_max * count(*) AS BIGINT) AS padded_slots,
       |       ${sqlR("1.0 - CAST(sum(n_tok) AS DOUBLE) / CAST(bucket_max * count(*) AS DOUBLE)", 6)} AS waste_ratio
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
}
