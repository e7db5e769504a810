package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Round-6 batch-34 operators (SURVEY §2 #242-#245): the ML-pipeline
  * embedding-coverage audit, PMI collocation mining, temporal Markov
  * model evaluation, and the double-fire event audit.
  */
object Round6Ops17 {

  // ------------------------------------------- #242 dq_embedding_coverage

  /** #242 dq_embedding_coverage: the ML-JOIN referential audit — the
    * documents and embeddings tables reconciled on their id axis: docs
    * without a vector (they silently vanish from every #30/#31
    * retrieval and #31f dedup), orphaned vectors (stale index rows a
    * re-embed left behind), dimension-width consistency (one mixed
    * batch poisons every dot product) and zero vectors (a failed
    * encode that cosine treats as NaN). #201 audits the relational
    * star; THIS is the same discipline for the model-artifact join a
    * training pipeline lives on. One row: counts + coverage.
    *
    * Scale shape: two id projections full-outer joined on the key
    * (AQE-planned), vector diagnostics map-only on the embeddings
    * scan, one 1-row rollup. */
  def dqEmbeddingCoverage(s: SparkSession, dir: String): DataFrame =
    dqEmbeddingCoverageDf(Tables.documents(s, dir), Tables.embeddings(s, dir))

  /** DataFrame-generic core: expects (doc_id) / (vec_id, embedding). */
  def dqEmbeddingCoverageDf(docs: DataFrame, emb: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id").as("id")).withColumn("has_doc", lit(1))
    // size > 0 guard: an EMPTY array must read not-zero on both engines
    // (Spark's aggregate returns the 0.0 seed; DuckDB's list_sum returns
    // NULL) — empties surface through the dim-width audit instead
    val v = emb.select(col("vec_id").as("id"),
        size(col("embedding")).as("dim"),
        (size(col("embedding")) > 0 &&
         aggregate(col("embedding"), lit(0.0d),
           (a, x) => a + abs(x.cast("double"))) === 0.0).as("is_zero"))
      .withColumn("has_vec", lit(1))
    d.join(v, Seq("id"), "full_outer")
      .agg(sum(coalesce(col("has_doc"), lit(0))).cast("long").as("n_docs"),
           sum(coalesce(col("has_vec"), lit(0))).cast("long").as("n_vecs"),
           sum(when(col("has_doc").isNotNull && col("has_vec").isNotNull, 1L)
                 .otherwise(0L)).as("n_matched"),
           sum(when(col("has_doc").isNotNull && col("has_vec").isNull, 1L)
                 .otherwise(0L)).as("docs_missing_vec"),
           sum(when(col("has_doc").isNull && col("has_vec").isNotNull, 1L)
                 .otherwise(0L)).as("vecs_orphaned"),
           countDistinct(col("dim")).as("n_dim_values"),
           sum(when(col("is_zero"), 1L).otherwise(0L)).as("n_zero_vecs"))
      .withColumn("coverage",
        r(col("n_matched") / col("n_docs").cast("double"), 6))
  }

  val dqEmbeddingCoverageSql: String =
    s"""WITH d AS (SELECT doc_id AS id, 1 AS has_doc FROM documents),
       |v AS (
       |  SELECT vec_id AS id, 1 AS has_vec, len(embedding) AS dim,
       |         len(embedding) > 0 AND coalesce(list_sum(list_transform(
       |           embedding, x -> abs(CAST(x AS DOUBLE)))), -1.0) = 0.0
       |           AS is_zero
       |  FROM embeddings),
       |j AS (
       |  SELECT d.has_doc, v.has_vec, v.dim, v.is_zero
       |  FROM d FULL OUTER JOIN v ON d.id = v.id)
       |SELECT CAST(sum(coalesce(has_doc, 0)) AS BIGINT) AS n_docs,
       |       CAST(sum(coalesce(has_vec, 0)) AS BIGINT) AS n_vecs,
       |       CAST(sum(CASE WHEN has_doc IS NOT NULL AND has_vec IS NOT NULL
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |       CAST(sum(CASE WHEN has_doc IS NOT NULL AND has_vec IS NULL
       |                THEN 1 ELSE 0 END) AS BIGINT) AS docs_missing_vec,
       |       CAST(sum(CASE WHEN has_doc IS NULL AND has_vec IS NOT NULL
       |                THEN 1 ELSE 0 END) AS BIGINT) AS vecs_orphaned,
       |       count(DISTINCT dim) AS n_dim_values,
       |       CAST(sum(CASE WHEN is_zero THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_zero_vecs,
       |       ${sqlR("sum(CASE WHEN has_doc IS NOT NULL AND has_vec IS NOT NULL THEN 1 ELSE 0 END) / CAST(sum(coalesce(has_doc, 0)) AS DOUBLE)", 6)}
       |         AS coverage
       |FROM j""".stripMargin

  // ----------------------------------------------- #243 doc_collocations

  /** Minimum bigram frequency and report size. */
  val CollocMinN = 5
  val CollocTopK = 20

  /** #243 doc_collocations: COLLOCATION mining by pointwise mutual
    * information — corpus-wide adjacent-token bigrams with count ≥
    * [[CollocMinN]], scored PMI = ln(p(ab)/(p(a)p(b))), top
    * [[CollocTopK]]. The phrase discovery behind tokenizer and
    * feature design: high-PMI pairs are the multi-word units a BPE
    * vocabulary (#153) should learn as one token and the phrases
    * shingle dedup treats as atoms; #67 counts bigrams, #125 scores
    * event-type pairs — this is the word-level PMI with the min-count
    * support floor that kills the hapax noise PMI is notorious for.
    *
    * Scale shape: one explode to bigrams + two vocabulary-bounded
    * aggregations (bigram and unigram counts), broadcast total
    * scalars, top-k via sort+limit (bounded heaps — never a ranking
    * window over the vocabulary). */
  def docCollocations(s: SparkSession, dir: String): DataFrame =
    docCollocationsDf(Tables.documents(s, dir))

  /** DataFrame-generic core: expects (doc_id, text). */
  def docCollocationsDf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), lowerTokens(col("text")).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).cast("double").as("t_uni"))
    val bi = toks
      .select(explode(when(size(col("t")) >= 2,
        transform(sequence(lit(1), size(col("t")) - 1), i =>
          struct(element_at(col("t"), i).as("a"),
                 element_at(col("t"), i + 1).as("b"))))
        .otherwise(expr("CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>)")))
        .as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= CollocMinN)
    val biTotal = toks
      .select(greatest(size(col("t")) - 1, lit(0)).cast("long").as("nb"))
      .agg(sum(col("nb")).cast("double").as("t_bi"))
    val scored = bi
      .join(uni.select(col("w").as("a"), col("c").as("ca")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("c").as("cb")), Seq("b"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(biTotal))
      .withColumn("pmi",
        r(log((col("n") / col("t_bi")) /
              ((col("ca") / col("t_uni")) * (col("cb") / col("t_uni")))), 6))
    scored.orderBy(col("pmi").desc, col("a"), col("b")).limit(CollocTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("a"), col("b"))).cast("long"))
      .select(col("rank"), col("a"), col("b"), col("n"), col("ca"), col("cb"),
              col("pmi"))
  }

  val docCollocationsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
       |  FROM documents),
       |uni AS (
       |  SELECT w, count(*) AS c FROM (
       |    SELECT unnest(t) AS w FROM toks)
       |  GROUP BY 1),
       |totals AS (SELECT CAST(sum(c) AS DOUBLE) AS t_uni FROM uni),
       |bt AS (
       |  SELECT CAST(sum(greatest(len(t) - 1, 0)) AS DOUBLE) AS t_bi
       |  FROM toks),
       |bi AS (
       |  SELECT a, b, count(*) AS n FROM (
       |    SELECT t[i] AS a, t[i+1] AS b
       |    FROM toks CROSS JOIN LATERAL (
       |      SELECT unnest(range(1, len(t))) AS i) ii)
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $CollocMinN),
       |scored AS (
       |  SELECT bi.a, bi.b, bi.n, ua.c AS ca, ub.c AS cb,
       |         ${sqlR("ln((bi.n / bt.t_bi) / ((ua.c / totals.t_uni) * (ub.c / totals.t_uni)))", 6)} AS pmi
       |  FROM bi JOIN uni ua ON ua.w = bi.a JOIN uni ub ON ub.w = bi.b
       |  CROSS JOIN totals CROSS JOIN bt)
       |SELECT CAST(row_number() OVER (ORDER BY pmi DESC, a, b) AS BIGINT)
       |         AS rank,
       |       a, b, n, ca, cb, pmi
       |FROM scored ORDER BY pmi DESC, a, b LIMIT $CollocTopK""".stripMargin

  // ----------------------------------------------- #244 events_markov_eval

  /** #244 events_markov_eval: TEMPORAL EVALUATION of the #60 Markov
    * model — transitions from the first half of the time range train a
    * next-type predictor (per previous type, the modal next), the
    * second half's transitions grade it: per-context accuracy against
    * the held-out future, with the train-marginal majority class as
    * the baseline every sequence model must beat. The walk-forward
    * eval discipline (#139 for forecasts) applied to the behavioral
    * model family (#60/#63/#189): a model whose accuracy ≈ baseline
    * has learned the marginal, not the dynamics.
    *
    * Scale shape: transitions from per-(user, half) lag windows
    * (bounded by events-per-user); train contexts collapse to the
    * ≤|types|² table; predictions broadcast back onto the test
    * transitions; one rollup per context. */
  def eventsMarkovEval(s: SparkSession, dir: String): DataFrame =
    eventsMarkovEvalDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_id,
    * event_type). */
  def eventsMarkovEvalDf(ev: DataFrame): DataFrame = {
    val dated = ev.withColumn("d", to_date(col("ts")))
    val bounds = dated.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
      .select(date_add(col("dmin"),
        (datediff(col("dmax"), col("dmin")) / 2).cast("int")).as("mid"))
    val tagged = dated.crossJoin(broadcast(bounds))
      .withColumn("half", when(col("d") <= col("mid"), 1).otherwise(2))
    val w = Window.partitionBy(col("user_id"), col("half"))
      .orderBy(col("ts"), col("event_id"))
    val trans = tagged
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("half"), col("prev"), col("event_type").as("next"))
    val train = trans.filter(col("half") === 1)
      .groupBy(col("prev"), col("next")).agg(count(lit(1)).as("n"))
    val pred = train
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("prev")).orderBy(col("n").desc, col("next"))))
      .filter(col("rk") === 1)
      .select(col("prev"), col("next").as("predicted"))
    val majority = train.groupBy(col("next")).agg(sum(col("n")).as("n"))
      .orderBy(col("n").desc, col("next")).limit(1)
      .select(col("next").as("majority"))
    val test = trans.filter(col("half") === 2)
      .join(graft.Hints.keyDim(pred), Seq("prev"))
      .crossJoin(broadcast(majority))
    test.groupBy(col("prev"))
      .agg(first(col("predicted")).as("predicted"),
           count(lit(1)).as("n_eval"),
           sum(when(col("next") === col("predicted"), 1L).otherwise(0L))
             .as("n_correct"),
           sum(when(col("next") === col("majority"), 1L).otherwise(0L))
             .as("n_baseline"))
      .withColumn("accuracy",
        r(col("n_correct") / col("n_eval").cast("double"), 6))
      .withColumn("baseline_acc",
        r(col("n_baseline") / col("n_eval").cast("double"), 6))
      .select(col("prev"), col("predicted"), col("n_eval"), col("n_correct"),
              col("accuracy"), col("baseline_acc"))
      .orderBy(col("prev"))
  }

  val eventsMarkovEvalSql: String =
    s"""WITH dated AS (
       |  SELECT user_id, ts, event_id, event_type, CAST(ts AS DATE) AS d
       |  FROM events),
       |mid AS (
       |  SELECT min(d) + CAST(datediff('day', min(d), max(d)) // 2 AS INT) AS mid
       |  FROM dated),
       |tagged AS (
       |  SELECT dated.*, CASE WHEN d <= mid.mid THEN 1 ELSE 2 END AS half
       |  FROM dated CROSS JOIN mid),
       |trans AS (
       |  SELECT half, prev, event_type AS next FROM (
       |    SELECT half, event_type,
       |           lag(event_type) OVER (PARTITION BY user_id, half
       |                                 ORDER BY ts, event_id) AS prev
       |    FROM tagged)
       |  WHERE prev IS NOT NULL),
       |train AS (
       |  SELECT prev, next, count(*) AS n FROM trans
       |  WHERE half = 1 GROUP BY 1, 2),
       |pred AS (
       |  SELECT prev, next AS predicted FROM (
       |    SELECT prev, next,
       |           row_number() OVER (PARTITION BY prev
       |                              ORDER BY n DESC, next) AS rk
       |    FROM train)
       |  WHERE rk = 1),
       |majority AS (
       |  SELECT next AS majority FROM (
       |    SELECT next, CAST(sum(n) AS BIGINT) AS n FROM train GROUP BY 1)
       |  ORDER BY n DESC, next LIMIT 1)
       |SELECT t.prev, first(p.predicted) AS predicted, count(*) AS n_eval,
       |       CAST(sum(CASE WHEN t.next = p.predicted THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_correct,
       |       ${sqlR("sum(CASE WHEN t.next = p.predicted THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |         AS accuracy,
       |       ${sqlR("sum(CASE WHEN t.next = m.majority THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)}
       |         AS baseline_acc
       |FROM trans t JOIN pred p USING (prev) CROSS JOIN majority m
       |WHERE t.half = 2
       |GROUP BY t.prev ORDER BY t.prev""".stripMargin

  // -------------------------------------------------- #245 dq_event_dupes

  /** #245 dq_event_dupes: the DOUBLE-FIRE audit — events identical on
    * (user, type, timestamp, value) grouped and counted per type:
    * duplicate groups, extra rows, and the inflation rate. The
    * telemetry bug class #167 catches for payments, at the event feed:
    * client retries without idempotency keys, at-least-once delivery
    * replays, and SDK double-mounts all fire the same event twice, and
    * every downstream count (#35, #64, #220) silently inflates until
    * this table pages. (#36b is the streaming FIX — watermarked dedup;
    * this is the batch AUDIT of how much there is to fix.)
    *
    * Scale shape: one groupBy on the composite identity, one per-type
    * rollup; both key-hashed aggregations, no windows, no joins. */
  def dqEventDupes(s: SparkSession, dir: String): DataFrame =
    dqEventDupesDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_type, value). */
  def dqEventDupesDf(ev: DataFrame): DataFrame = {
    val g = ev.groupBy(col("user_id"), col("event_type"), col("ts"),
                       col("value"))
      .agg(count(lit(1)).as("c"))
    g.groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_rows"),
           count(lit(1)).as("n_groups"),
           sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dupe_groups"),
           sum(when(col("c") > 1, col("c") - 1).otherwise(0L)).as("n_extra_rows"))
      .withColumn("dupe_rate",
        r(col("n_extra_rows") / col("n_rows").cast("double"), 6))
      .orderBy(col("event_type"))
  }

  val dqEventDupesSql: String =
    s"""WITH g AS (
       |  SELECT user_id, event_type, ts, value, count(*) AS c
       |  FROM events GROUP BY 1, 2, 3, 4)
       |SELECT event_type,
       |       CAST(sum(c) AS BIGINT) AS n_rows,
       |       count(*) AS n_groups,
       |       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dupe_groups,
       |       CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
       |         AS n_extra_rows,
       |       ${sqlR("sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) / CAST(sum(c) AS DOUBLE)", 6)}
       |         AS dupe_rate
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
}
