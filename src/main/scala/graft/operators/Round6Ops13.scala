package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Round-6 batch-30 operators (SURVEY §2 #225-#227): Granger causality
  * between daily volumes, RAG-style passage chunking, and the A/B
  * sample-ratio-mismatch gate. (#228 stream_volume_anomaly lives in
  * [[graft.streaming.Streaming]] and drains #220's day registers.)
  */
object Round6Ops13 {

  // -------------------------------------------------------- #225 ts_granger

  /** Conventional F screen (≈5% for the df=1 numerator at moderate n). */
  val GrangerFCrit = 4.0

  /** #225 ts_granger: GRANGER CAUSALITY between event types' daily
    * volumes — for every ordered pair (x → y), does yesterday's x
    * volume improve today's y forecast beyond y's own yesterday? The
    * unrestricted OLS y_t = a + b·y_{t−1} + c·x_{t−1} against the
    * restricted autoregression, F = (SSR_r − SSR_u)(n−3)/SSR_u at one
    * lag. The DIRECTED lead-lag screen completing the dependence
    * toolkit: #85's cross-correlation is symmetric, #125's PMI is
    * static co-occurrence — Granger says which series LEADS, the
    * question capacity planning actually asks (do signups drive
    * purchases tomorrow?).
    *
    * Scale shape: one (type, day) aggregation collapses the corpus to
    * ≤ types×days rows; the lag joins fan that bounded grid to
    * ≤ types²×days; decimal-exact moments per ordered pair, then
    * closed-form two-regressor algebra (Frisch–Waugh demeaned 2×2
    * solve) on the ≤ types² rollup — no matrix library, nothing
    * collected. */
  def tsGranger(s: SparkSession, dir: String): DataFrame =
    tsGrangerDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, ts). */
  def tsGrangerDf(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("v"))
    val y = daily.select(col("event_type").as("ty"), col("d"), col("v").as("yv"))
    val yl = daily.select(col("event_type").as("ty"), col("d").as("dl"),
                          col("v").as("y1"))
    val xl = daily.select(col("event_type").as("tx"), col("d").as("dl"),
                          col("v").as("x1"))
    val rows = y
      .join(yl, y("ty") === yl("ty") && date_add(col("dl"), 1) === y("d"))
      .drop(yl("ty")).drop("dl")
      .join(xl, date_add(xl("dl"), 1) === y("d") && col("tx") =!= col("ty"))
      .drop("dl")
    val m = rows.groupBy(col("tx"), col("ty"))
      .agg(count(lit(1)).as("n"),
           dsum(col("yv")).as("sy"), dsum(col("y1")).as("s1"),
           dsum(col("x1")).as("s2"), dsum(col("yv") * col("yv")).as("syy"),
           dsum(col("y1") * col("y1")).as("s11"),
           dsum(col("x1") * col("x1")).as("s22"),
           dsum(col("yv") * col("y1")).as("sy1"),
           dsum(col("yv") * col("x1")).as("sy2"),
           dsum(col("y1") * col("x1")).as("s12"))
      .filter(col("n") >= 10)
    val n = col("n").cast("double")
    val c11 = col("s11") - col("s1") * col("s1") / n
    val c22 = col("s22") - col("s2") * col("s2") / n
    val c12 = col("s12") - col("s1") * col("s2") / n
    val cy1 = col("sy1") - col("s1") * col("sy") / n
    val cy2 = col("sy2") - col("s2") * col("sy") / n
    val cyy = col("syy") - col("sy") * col("sy") / n
    val det = c11 * c22 - c12 * c12
    val b = (cy1 * c22 - cy2 * c12) / det
    val c = (cy2 * c11 - cy1 * c12) / det
    val ssrU = cyy - b * cy1 - c * cy2
    val ssrR = cyy - (cy1 / c11) * cy1
    val f = (ssrR - ssrU) * (n - 3) / ssrU
    m.filter(c11 > 0 && det > 0)
      .withColumn("coef_xlag", r(c, 6))
      .withColumn("f_stat", when(ssrU > 0, r(f, 6)).otherwise(lit(0.0)))
      .withColumn("granger", col("f_stat") > GrangerFCrit)
      .select(col("tx").as("cause"), col("ty").as("effect"), col("n"),
              col("coef_xlag"), col("f_stat"), col("granger"))
      .orderBy(col("cause"), col("effect"))
  }

  val tsGrangerSql: String = {
    val n = "CAST(n AS DOUBLE)"
    val c11 = s"(s11 - s1 * s1 / $n)"
    val c22 = s"(s22 - s2 * s2 / $n)"
    val c12 = s"(s12 - s1 * s2 / $n)"
    val cy1 = s"(sy1 - s1 * sy / $n)"
    val cy2 = s"(sy2 - s2 * sy / $n)"
    val cyy = s"(syy - sy * sy / $n)"
    val det = s"($c11 * $c22 - $c12 * $c12)"
    val b = s"(($cy1 * $c22 - $cy2 * $c12) / $det)"
    val c = s"(($cy2 * $c11 - $cy1 * $c12) / $det)"
    val ssrU = s"($cyy - $b * $cy1 - $c * $cy2)"
    val ssrR = s"($cyy - ($cy1 / $c11) * $cy1)"
    val f = s"(($ssrR - $ssrU) * ($n - 3) / $ssrU)"
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS d,
       |         CAST(count(*) AS DOUBLE) AS v
       |  FROM events GROUP BY 1, 2),
       |rows_ AS (
       |  SELECT x.event_type AS tx, y.event_type AS ty,
       |         y.v AS yv, l.v AS y1, x.v AS x1
       |  FROM daily y
       |  JOIN daily l ON l.event_type = y.event_type AND l.d + 1 = y.d
       |  JOIN daily x ON x.d + 1 = y.d AND x.event_type <> y.event_type),
       |m AS (
       |  SELECT tx, ty, count(*) AS n,
       |         ${sqlSum("yv")} AS sy, ${sqlSum("y1")} AS s1,
       |         ${sqlSum("x1")} AS s2, ${sqlSum("yv * yv")} AS syy,
       |         ${sqlSum("y1 * y1")} AS s11, ${sqlSum("x1 * x1")} AS s22,
       |         ${sqlSum("yv * y1")} AS sy1, ${sqlSum("yv * x1")} AS sy2,
       |         ${sqlSum("y1 * x1")} AS s12
       |  FROM rows_ GROUP BY 1, 2
       |  HAVING count(*) >= 10)
       |SELECT tx AS cause, ty AS effect, n,
       |       ${sqlR(c, 6)} AS coef_xlag,
       |       CASE WHEN $ssrU > 0 THEN ${sqlR(f, 6)} ELSE 0.0 END AS f_stat,
       |       (CASE WHEN $ssrU > 0 THEN ${sqlR(f, 6)} ELSE 0.0 END)
       |         > $GrangerFCrit AS granger
       |FROM m WHERE $c11 > 0 AND $det > 0
       |ORDER BY cause, effect""".stripMargin
  }

  // ----------------------------------------------- #226 doc_chunk_passages

  /** Retrieval chunk geometry: window and stride in tokens (16-token
    * overlap so no answer span straddles a boundary unseen). */
  val ChunkSize = 64
  val ChunkStride = 48

  /** #226 doc_chunk_passages: RAG-style PASSAGE CHUNKING — every
    * document split into [[ChunkSize]]-token windows at
    * [[ChunkStride]]-token stride (overlapping, so a span near a
    * boundary appears whole in the next chunk), each chunk emitted
    * with its position, token count and content fingerprint. The
    * retrieval-side sibling of #118: pack_sequences tiles docs into
    * fixed TRAINING windows back-to-back; chunking windows WITHIN each
    * doc for embedding + kNN indexing (#30/#31), and the chunk_md5 is
    * the join key embeddings come back on. Deterministic: the same doc
    * always yields the same chunks — re-indexing is incremental.
    *
    * Scale shape: per-row higher-order expressions build the start
    * grid (sequence/transform), one explode fans to chunks — no
    * shuffle before the explode, ≤ ⌈n/stride⌉ chunks per doc. */
  def docChunkPassages(s: SparkSession, dir: String): DataFrame =
    docChunkPassagesDf(Tables.documents(s, dir))

  /** DataFrame-generic core: expects (doc_id, text). */
  def docChunkPassagesDf(docs: DataFrame): DataFrame = {
    val toks = lowerTokens(col("text"))
    val n = size(col("toks"))
    val nChunks = when(n <= ChunkSize, lit(1))
      .otherwise(lit(1) +
        ceil((n - ChunkSize).cast("double") / ChunkStride).cast("int"))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n_tok", n)
      .withColumn("idx", explode(sequence(lit(1), nChunks)))
      .withColumn("start_tok", lit(1) + (col("idx") - 1) * ChunkStride)
      .withColumn("ctoks",
        slice(col("toks"), col("start_tok"),
              least(lit(ChunkSize), col("n_tok") - col("start_tok") + 1)))
      .select(col("doc_id"), col("idx").cast("long").as("chunk_idx"),
              col("start_tok").cast("long").as("start_tok"),
              size(col("ctoks")).as("n_tokens"),
              md5(concat_ws(" ", col("ctoks")).cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val docChunkPassagesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, toks, len(toks) AS n_tok,
       |         CASE WHEN len(toks) <= $ChunkSize THEN 1
       |              ELSE 1 + CAST(ceil((len(toks) - $ChunkSize) / $ChunkStride.0)
       |                            AS INT) END AS n_chunks
       |  FROM t),
       |fan AS (
       |  SELECT doc_id, toks, n_tok,
       |         unnest(range(1, n_chunks + 1)) AS idx
       |  FROM g),
       |ch AS (
       |  SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
       |         CAST(1 + (idx - 1) * $ChunkStride AS BIGINT) AS start_tok,
       |         toks[(1 + (idx - 1) * $ChunkStride):
       |              (1 + (idx - 1) * $ChunkStride +
       |               least($ChunkSize, n_tok - (1 + (idx - 1) * $ChunkStride) + 1) - 1)]
       |           AS ctoks
       |  FROM fan)
       |SELECT doc_id, chunk_idx, start_tok,
       |       len(ctoks) AS n_tokens,
       |       md5(array_to_string(ctoks, ' ')) AS chunk_md5
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  // -------------------------------------------------- #227 events_ab_srm

  /** χ²(0.95, 1) — the SRM alarm boundary. */
  val SrmCrit = 3.841459

  /** #227 events_ab_srm: the SAMPLE-RATIO-MISMATCH gate — a chi-square
    * test of the realized arm sizes against the designed 50/50 split
    * under #137's deterministic md5 assignment. THE mandatory sanity
    * check before reading any experiment dashboard: a biased split
    * (broken hash, bot filtering that correlates with arm, partial
    * logging) silently invalidates #137's lift, #141's CUPED
    * adjustment and #149's power math, and the industry-standard
    * practice is to refuse to read them when SRM fires. One row: arm
    * counts, χ², verdict.
    *
    * Scale shape: one distinct-users pass, one conditional-count
    * aggregate — a 1-row result; the χ² is scalar algebra. */
  def eventsAbSrm(s: SparkSession, dir: String): DataFrame =
    eventsAbSrmDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id). */
  def eventsAbSrmDf(ev: DataFrame): DataFrame = {
    val users = ev.select(col("user_id")).distinct()
      .withColumn("arm", Round6Ops2.armExpr)
    val sizes = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val e = (col("n_a") + col("n_b")).cast("double") / 2.0
    val chi2 = (col("n_a") - e) * (col("n_a") - e) / e +
               (col("n_b") - e) * (col("n_b") - e) / e
    sizes
      .withColumn("expected", e)
      .withColumn("chi2", r(chi2, 6))
      .withColumn("srm", col("chi2") > SrmCrit)
      .select(col("n_a"), col("n_b"), col("expected"), col("chi2"), col("srm"))
  }

  val eventsAbSrmSql: String =
    s"""WITH ${Round6Ops2.armSqlCte},
       |sizes AS (
       |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM users)
       |SELECT n_a, n_b,
       |       CAST(n_a + n_b AS DOUBLE) / 2.0 AS expected,
       |       ${sqlR("(n_a - CAST(n_a + n_b AS DOUBLE) / 2.0) * (n_a - CAST(n_a + n_b AS DOUBLE) / 2.0) / (CAST(n_a + n_b AS DOUBLE) / 2.0) + (n_b - CAST(n_a + n_b AS DOUBLE) / 2.0) * (n_b - CAST(n_a + n_b AS DOUBLE) / 2.0) / (CAST(n_a + n_b AS DOUBLE) / 2.0)", 6)} AS chi2,
       |       ${sqlR("(n_a - CAST(n_a + n_b AS DOUBLE) / 2.0) * (n_a - CAST(n_a + n_b AS DOUBLE) / 2.0) / (CAST(n_a + n_b AS DOUBLE) / 2.0) + (n_b - CAST(n_a + n_b AS DOUBLE) / 2.0) * (n_b - CAST(n_a + n_b AS DOUBLE) / 2.0) / (CAST(n_a + n_b AS DOUBLE) / 2.0)", 6)} > $SrmCrit AS srm
       |FROM sizes""".stripMargin
}
