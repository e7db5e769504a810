package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions.stopwordsEn
import graft.sources.Tables

/** Round-9 batch-3 operators (SURVEY §2 #306-#309): spectral entropy
  * over the periodogram, RAKE keyphrase extraction, classifier-scored
  * importance sampling, and the in-stream scoring/calibration registers.
  */
object Round9Ops3 {

  // ------------------------------------------ #306 ts_spectral_entropy

  /** #306 ts_spectral_entropy: SPECTRAL ENTROPY of the #125b
    * Lomb-style periodogram — per series, how concentrated the power is
    * across the candidate period grid: entropy of the normalized power
    * shares (÷ln k, so 0 = one pure tone, 1 = white across the grid)
    * plus the dominant period and its share. The single-number
    * "is this series rhythmic at all" gate that decides whether the
    * #147/#176 seasonal models apply — a high-entropy user has no
    * period worth fitting.
    *
    * Scale shape: rides the #125b per-(user, period) power table
    * unchanged (k = 3 rows per user); total/share/entropy are one more
    * key-proportional rollup and the dominant pick is a rank-1 window
    * over k rows per key. Shares 6dp-round before the ln (the #125 PMI
    * discipline); ln k normalizes off the same rounded ladder. */
  def tsSpectralEntropy(s: SparkSession, dir: String): DataFrame = {
    val pg = Round6Ops2.tsPeriodogramDf(Mhw.daily(s, dir))
      .transform(graft.Lineage.pinLazy)
    val tot = pg.groupBy(col("user_id"))
      .agg(dsum(col("power")).as("total"), count(lit(1)).as("k"))
      .filter(col("total") > 0)
    val ent = pg.join(tot, "user_id")
      .withColumn("share", r(col("power") / col("total"), 6))
      .groupBy(col("user_id"))
      .agg(dsum(when(col("share") > 0,
                     -col("share") * r(log(col("share")), 6))
                  .otherwise(lit(0.0)), 6).as("h_raw"),
           max(col("k")).as("k"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("power").desc, col("period"))
    val dom = pg.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("period").as("dominant_period"), col("power"))
    ent.join(dom, "user_id")
      .join(tot.select(col("user_id"), col("total")), "user_id")
      .select(col("user_id"), col("k").as("n_periods"), col("dominant_period"),
              r(col("power") / col("total"), 6).as("dominant_share"),
              when(col("k") > 1,
                   r(col("h_raw") / r(log(col("k").cast("double")), 6), 6))
                .otherwise(lit(0.0)).as("spectral_entropy"))
      .orderBy(col("user_id"))
  }

  val tsSpectralEntropySql: String = {
    val term = s"CASE WHEN share > 0 THEN -share * (${sqlR("ln(share)", 6)}) ELSE 0.0 END"
    s"""WITH pg AS (
       |  SELECT user_id, period, power FROM (${Round6Ops2.tsPeriodogramSql})),
       |tot AS (
       |  SELECT user_id, ${sqlSum("power")} AS total, count(*) AS k
       |  FROM pg GROUP BY 1 HAVING ${sqlSum("power")} > 0),
       |ent AS (
       |  SELECT user_id, ${sqlSum(term, 6)} AS h_raw, max(k) AS k
       |  FROM (SELECT p.user_id, ${sqlR("p.power / t.total", 6)} AS share, t.k
       |        FROM pg p JOIN tot t USING (user_id))
       |  GROUP BY 1),
       |dom AS (
       |  SELECT user_id, period AS dominant_period, power FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id
       |      ORDER BY power DESC, period) AS rn FROM pg)
       |  WHERE rn = 1)
       |SELECT e.user_id, CAST(e.k AS BIGINT) AS n_periods, d.dominant_period,
       |       ${sqlR("d.power / t.total", 6)} AS dominant_share,
       |       CASE WHEN e.k > 1
       |            THEN ${sqlR(s"e.h_raw / (${sqlR("ln(CAST(e.k AS DOUBLE))", 6)})", 6)}
       |            ELSE 0.0 END AS spectral_entropy
       |FROM ent e JOIN dom d USING (user_id) JOIN tot t USING (user_id)
       |ORDER BY user_id""".stripMargin
  }

  // ------------------------------------------ #307 doc_keyphrase_rake

  /** #307 doc_keyphrase_rake: RAKE keyphrase extraction (Rose et al.
    * 2010) — candidate phrases are the maximal stopword-free token
    * runs; each word scores deg/freq over the phrase co-occurrence
    * graph (deg counts the word's phrase-mates including itself, so
    * words living in long phrases outrank equally-frequent isolated
    * ones); a phrase scores the sum of its member word scores. Per doc
    * the top-`topK` phrases by (score desc, phrase asc) — the
    * unsupervised doc-labeling stage a corpus browser or topic router
    * runs beside #56 TF-IDF (which ranks single TERMS; RAKE returns
    * multi-word UNITS without any n-gram explosion).
    *
    * Scale shape: one posexplode scan; phrase assembly is a per-doc
    * gaps-and-islands window (pos − row_number over non-stop tokens —
    * the #294 adjacency discipline); word stats are one corpus-wide
    * (token) rollup — the only cross-doc shuffle, keyed on the bounded
    * vocabulary; phrase scores and the top-k pick are per-doc rollup +
    * rank-1 window, all key-proportional. Word scores 6dp-round before
    * the decimal phrase sum (the #125 discipline). */
  def docKeyphraseRake(s: SparkSession, dir: String, topK: Int = 3): DataFrame =
    rakeDf(Tables.documents(s, dir), topK)

  /** The shared RAKE chain up to per-(doc, phrase-occurrence) scores:
    * (doc_id, grp, score, phrase, n_words). #307 ranks per doc, #315
    * rolls up the corpus index. */
  private[graft] def rakePhraseScores(docs: DataFrame): DataFrame =
    // memoized + persisted per input plan (the shingleTable pattern):
    // #307 doc_keyphrase_rake and #315 corpus_keyphrase_index score
    // the IDENTICAL phrase table — one evaluation per session
    graft.Caches.persisted(docs.sparkSession,
        ("rake_phrases", docs.semanticHash())) {
      rakePhraseScoresUncached(docs)
    }

  private def rakePhraseScoresUncached(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
              posexplode(split(lower(trim(col("text"))), " ")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
    val wn = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val occ = toks.filter(!col("tok").isin(stopwordsEn: _*))
      .withColumn("grp", col("pos") - row_number().over(wn))
    val plen = occ.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("plen"))
    val occP = occ.join(plen, Seq("doc_id", "grp"))
      .transform(graft.Lineage.pinLazy)
    val wstats = occP.groupBy(col("tok"))
      .agg(r(sum(col("plen")).cast("double") / count(lit(1)), 6).as("wscore"))
    occP.join(wstats, "tok")
      .groupBy(col("doc_id"), col("grp"))
      .agg(dsum(col("wscore"), 6).as("score"),
           concat_ws(" ",
             transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
                       x => x.getField("tok"))).as("phrase"),
           count(lit(1)).as("n_words"))
  }

  /** The RAKE CTE prefix shared by #307's and #315's oracles — ends
    * with `ps` (doc_id, grp, score, phrase, n_words). */
  private[graft] val rakeChainSql: String = {
    val stopList = stopwordsEn.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(string_split(lower(trim(text)), ' ')) AS tok,
       |         generate_subscripts(string_split(lower(trim(text)), ' '), 1) AS pos
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, pos, tok,
       |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM toks WHERE tok NOT IN ($stopList)),
       |plen AS (SELECT doc_id, grp, count(*) AS plen FROM occ GROUP BY 1, 2),
       |occp AS (SELECT o.*, p.plen FROM occ o JOIN plen p USING (doc_id, grp)),
       |wstats AS (
       |  SELECT tok,
       |         ${sqlR("CAST(sum(plen) AS DOUBLE) / count(*)", 6)} AS wscore
       |  FROM occp GROUP BY 1),
       |ps AS (
       |  SELECT o.doc_id, o.grp, ${sqlSum("w.wscore", 6)} AS score,
       |         string_agg(o.tok, ' ' ORDER BY o.pos) AS phrase,
       |         count(*) AS n_words
       |  FROM occp o JOIN wstats w USING (tok)
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** DataFrame-generic core: expects canonical (doc_id, text). */
  def rakeDf(docs: DataFrame, topK: Int = 3): DataFrame = {
    val rw = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    rakePhraseScores(docs).withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
              col("phrase"), col("n_words"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  def docKeyphraseRakeSql(topK: Int = 3): String = {
    s"""$rakeChainSql,
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, phrase) AS rank
       |  FROM ps)
       |SELECT doc_id, CAST(rank AS INT) AS rank, phrase, n_words, score
       |FROM rk WHERE rank <= $topK
       |ORDER BY doc_id, rank""".stripMargin
  }

  // ------------------------------------ #309 corpus_classifier_sample

  /** The #82 md5-uniform draw on doc_id — the deterministic u ∈ [0,1)
    * every sampling operator shares (no RNG, reproducible, unit-keyed). */
  private def uniformOf(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("bigint").cast("double") / math.pow(2, 60)

  private def uniformOfSql(id: String): String =
    s"CAST(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)" +
      s" / ${math.pow(2, 60)}"

  /** #309 corpus_classifier_sample: CLASSIFIER-SCORED importance
    * sampling — the GPT-3 curation recipe end-to-end: train the #305
    * quality classifier, score every document, keep a document when its
    * md5-uniform draw falls under its score (acceptance ∝ score, so the
    * kept corpus is importance-weighted toward classifier-preferred
    * docs without any global sort or quantile). Per-source readout:
    * doc count, kept count, mean score and realized keep rate — by the
    * law of large numbers the realized rate tracks the mean score,
    * which the spec pins as the algebraic self-check.
    *
    * Scale shape: training is #305's (model-sized collects only);
    * scoring + the acceptance test are map-only with the weights
    * inlined as literals; one ≤|sources| rollup. The decision column
    * is per-row deterministic, so re-running yields the same corpus —
    * the reproducibility property a training-data freeze needs. */
  def corpusClassifierSample(s: SparkSession, dir: String, steps: Int = 8,
                             lr: Double = 0.5): DataFrame = {
    val x = Round9Ops2.classifierFeatures(Tables.documents(s, dir))
    val w = Round9Ops2.trainedWeights(s, dir, steps, lr).last
    val keep = uniformOf(col("doc_id")) < col("score")
    x.select(col("doc_id"), Round9Ops2.pOf(w).as("score"))
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")), "doc_id")
      .withColumn("kept", keep)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
           davg(col("score"), 6).as("mean_score"))
      .withColumn("kept_rate",
        r(col("n_kept") / col("n_docs").cast("double"), 6))
      .orderBy(col("source"))
  }

  def corpusClassifierSampleSql(steps: Int = 8, lr: Double = 0.5): String =
    s"""${Round9Ops2.classifierChainSql(steps, lr)},
       |scored AS (
       |  SELECT x.doc_id, ${Round9Ops2.classifierPSql} AS score
       |  FROM x CROSS JOIN w$steps w),
       |dec AS (
       |  SELECT d.source, s.score,
       |         CASE WHEN ${uniformOfSql("s.doc_id")} < s.score
       |              THEN 1 ELSE 0 END AS kept
       |  FROM scored s JOIN documents d USING (doc_id))
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(kept) AS BIGINT) AS n_kept,
       |       ${sqlR(s"${sqlSum("score")} / count(score)", 6)} AS mean_score,
       |       ${sqlR("sum(kept) / CAST(count(*) AS DOUBLE)", 6)} AS kept_rate
       |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------- #308 stream_classifier_calibration

  /** The trained model as driver-side literals: (means, sds, weights) —
    * the artifact a scoring stream ships (a stream cannot re-aggregate
    * corpus moments; the batch training pass exports them, the #284
    * literal-scalar discipline). Means/sds replicate the column-side
    * formula bit-identically (same IEEE ops on the same collected
    * decimal sums). */
  private[graft] def classifierModel(s: SparkSession, dir: String,
                                     steps: Int = 8, lr: Double = 0.5)
      : (Array[Double], Array[Double], Array[Double]) = {
    val docs = Tables.documents(s, dir)
    val w = Round9Ops2.trainedWeights(s, dir, steps, lr).last
    val st = Round9Ops2.classifierStats(docs).collect()(0)
    val n = st.getDouble(0)
    val means = Array.tabulate(3)(j => r6d(st.getDouble(1 + 2 * j) / n))
    val sds = Array.tabulate(3) { j =>
      val sx = st.getDouble(1 + 2 * j); val qx = st.getDouble(2 + 2 * j)
      r6d(math.sqrt((qx - sx * sx / n) / (n - 1)))
    }
    (means, sds, w)
  }

  /** Map-only score expression on a raw (text, lang) row under literal
    * model params — the per-doc stage of the #308 stream. */
  private[graft] def scoreColLiteral(means: Array[Double], sds: Array[Double],
                                     w: Array[Double]): Column = {
    val fs = Round9Ops2.rawFeatureCols
    val xs = fs.indices.map(j => r((fs(j) - lit(means(j))) / lit(sds(j)), 6))
    val z = r(lit(w(0)) + lit(w(1)) * xs(0) + lit(w(2)) * xs(1) +
              lit(w(3)) * xs(2), 6)
    r(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** #308's registers: ≤10 (score-decile bucket) rows with doc and
    * positive-label counts — both merge by addition, so the drained
    * table is bit-identical to a batch pass. */
  private[graft] def calibRegisters(docs: DataFrame, means: Array[Double],
                                    sds: Array[Double],
                                    w: Array[Double]): DataFrame = {
    val score = scoreColLiteral(means, sds, w)
    docs
      .select(least(floor(score * 10), lit(9L)).cast("int").as("bucket"),
              when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"))
  }

  /** Calibration readout over the bounded register table: per bucket,
    * corpus share and observed positive rate (vs the bucket's implied
    * score band) — the reliability diagram a deployed filter monitors. */
  private[graft] def calibFinalize(regs: DataFrame): DataFrame = {
    val tot = regs.agg(sum(col("n_docs")).as("total"))
    regs.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_docs"), col("n_pos"),
              r(col("n_docs") / col("total").cast("double"), 6).as("share"),
              r(col("n_pos") / col("n_docs").cast("double"), 6).as("pos_rate"))
      .orderBy(col("bucket"))
  }

  /** #308's oracle: the full training chain + the decile rollup. */
  def streamClassifierCalibrationSql(steps: Int = 8, lr: Double = 0.5): String =
    s"""${Round9Ops2.classifierChainSql(steps, lr)},
       |sc AS (
       |  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bucket, y
       |  FROM (SELECT ${Round9Ops2.classifierPSql} AS p, x.y
       |        FROM x CROSS JOIN w$steps w)),
       |b AS (
       |  SELECT bucket, count(*) AS n_docs,
       |         CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
       |  FROM sc GROUP BY 1),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM b)
       |SELECT bucket, n_docs, n_pos,
       |       ${sqlR("n_docs / CAST(total AS DOUBLE)", 6)} AS share,
       |       ${sqlR("n_pos / CAST(n_docs AS DOUBLE)", 6)} AS pos_rate
       |FROM b CROSS JOIN t ORDER BY bucket""".stripMargin
}
