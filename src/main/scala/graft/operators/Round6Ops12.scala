package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Round-6 batch-29 operators (SURVEY §2 #221-#224): template-cluster
  * detection, OCR/encoding-garbage scoring, position-based marketing
  * attribution, and the code-vs-prose router.
  */
object Round6Ops12 {

  // ---------------------------------------------- #221 doc_template_detect

  /** #221 doc_template_detect: TEMPLATE clustering by structural
    * skeleton — every alphanumeric run collapses to '#', whitespace
    * normalizes, and the md5 of that skeleton groups documents that
    * share their fixed scaffolding while differing only in the filled
    * slots (mail-merge spam, listing pages, license boilerplate
    * wrappers). The cluster view #184's per-line boilerplate share
    * can't give: #184 finds repeated LINES, this finds repeated
    * STRUCTURE even when every slot value is unique — exactly the
    * near-dup class MinHash under-scores (slots perturb most shingles)
    * and quality filters miss (each instance reads fine alone).
    * Clusters of ≥ 2 are reported with their source spread and slot
    * statistics.
    *
    * Scale shape: map-only skeleton hash, one groupBy(skeleton) —
    * exact-dedup's shape (#25) on a derived key; the corpus total is a
    * broadcast 1-row aggregate, never a window over documents. */
  def docTemplateDetect(s: SparkSession, dir: String): DataFrame =
    docTemplateDetectDf(Tables.documents(s, dir))

  /** DataFrame-generic core: expects (doc_id, source, text). */
  def docTemplateDetectDf(docs: DataFrame): DataFrame = {
    val skeleton = regexp_replace(
      regexp_replace(lower(trim(col("text"))), "[a-z0-9]+", "#"),
      "\\s+", " ")
    val total = docs.agg(count(lit(1)).cast("double").as("n_total"))
    docs
      .select(col("doc_id"), col("source"),
              md5(skeleton.cast("binary")).as("skeleton_md5"),
              size(lowerTokens(col("text"))).as("n_tok"))
      .groupBy(col("skeleton_md5"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("source")).as("n_sources"),
           min(col("doc_id")).as("min_doc_id"),
           r(dsum(col("n_tok").cast("double")) / count(lit(1)), 6)
             .as("mean_tokens"))
      .filter(col("n_docs") >= 2)
      .crossJoin(broadcast(total))
      .withColumn("corpus_share", r(col("n_docs") / col("n_total"), 6))
      .drop("n_total")
      .orderBy(col("n_docs").desc, col("skeleton_md5"))
  }

  val docTemplateDetectSql: String =
    s"""WITH sk AS (
       |  SELECT doc_id, source,
       |         md5(regexp_replace(regexp_replace(lower(trim(text)),
       |               '[a-z0-9]+', '#', 'g'), '\\s+', ' ', 'g')) AS skeleton_md5,
       |         len(string_split(lower(trim(text)), ' ')) AS n_tok
       |  FROM documents),
       |g AS (
       |  SELECT skeleton_md5, count(*) AS n_docs,
       |         count(DISTINCT source) AS n_sources,
       |         min(doc_id) AS min_doc_id,
       |         ${sqlR(s"${sqlSum("CAST(n_tok AS DOUBLE)")} / count(*)", 6)}
       |           AS mean_tokens
       |  FROM sk GROUP BY 1
       |  HAVING count(*) >= 2)
       |SELECT skeleton_md5, n_docs, n_sources, min_doc_id, mean_tokens,
       |       ${sqlR("n_docs / (SELECT CAST(count(*) AS DOUBLE) FROM documents)", 6)}
       |         AS corpus_share
       |FROM g ORDER BY n_docs DESC, skeleton_md5""".stripMargin

  // ------------------------------------------------ #222 text_garbage_score

  /** Flag threshold for the combined artifact score — below ½ because
    * pure-ASCII OCR junk earns nothing from the non-ASCII term (its
    * classes top out at 0.55 combined), while saturated mojibake alone
    * reaches 0.45. */
  val GarbageThreshold = 0.4

  /** #222 text_garbage_score: OCR/ENCODING-ARTIFACT screen — per
    * document, the four classic symptoms of scanned-PDF extraction and
    * mojibake, weighted so an EXTREME single class can page alone
    * (mojibake has no mid-word case breaks; ASCII OCR junk has no
    * non-ASCII): non-printable/non-ASCII density, mid-word case breaks
    * ("theResult" — OCR join artifacts), punctuation runs ("..,,!"),
    * and letter-digit-letter infixes ("l0rem" — the 0/O, 1/l confusion
    * class); each saturating ratio feeds one fixed IEEE combination.
    * The cleanup filter pretraining pipelines run BEFORE quality
    * scoring: #22/#24j grade well-formed prose, garbage isn't prose at
    * all, and LM-scoring it (#24g) wastes the budget #77 allocates.
    *
    * Scale shape: map-only regexp counts (codegen'd, no UDF), one scan,
    * no shuffle — the #208 discipline. */
  def textGarbageScore(s: SparkSession, dir: String): DataFrame =
    textGarbageScoreDf(Tables.documents(s, dir))

  /** The four artifact ratios over a `text` column — shared with the
    * #266 disposition gate. greatest(len, 1): an empty text has zero
    * artifact counts, so the clamped denominator yields exact 0 ratios
    * and a false verdict instead of NULL-poisoning routing filters. */
  private[graft] def garbageRatios: Seq[(String, Column)] = {
    val len = greatest(length(col("text")).cast("double"), lit(1.0))
    def ratio(pat: String): Column =
      r(regexp_count(col("text"), lit(pat)) / len, 6)
    Seq("nonascii_ratio" -> ratio("[^ -~]"),
        "midcase_ratio" -> ratio("[a-z][A-Z]"),
        "punctrun_ratio" -> ratio("[.,;:!?]{2,}"),
        "mix_ratio" ->
          r(regexp_count(lower(col("text")), lit("[a-z][0-9]+[a-z]")) / len, 6))
  }

  /** The #222 score as one self-contained column (ratios inlined). */
  private[graft] def garbageScoreCol: Column = {
    val m = garbageRatios.toMap
    r(least(lit(1.0), m("nonascii_ratio") * 10) * 0.45 +
      least(lit(1.0), m("midcase_ratio") * 30) * 0.3 +
      least(lit(1.0), m("punctrun_ratio") * 10) * 0.1 +
      least(lit(1.0), m("mix_ratio") * 10) * 0.15, 6)
  }

  /** The #222 score as one self-contained DuckDB fragment over a
    * `text` column (ratios inlined) — the #266 oracle reads THIS. */
  private[graft] val garbageScoreSqlFrag: String = {
    val len = "greatest(CAST(length(text) AS DOUBLE), 1.0)"
    def ratio(pat: String) =
      sqlR(s"len(regexp_extract_all(text, '$pat')) / $len", 6)
    val mix =
      sqlR(s"len(regexp_extract_all(lower(text), '[a-z][0-9]+[a-z]')) / $len", 6)
    sqlR(s"least(1.0, (${ratio("[^ -~]")}) * 10) * 0.45 + " +
         s"least(1.0, (${ratio("[a-z][A-Z]")}) * 30) * 0.3 + " +
         s"least(1.0, (${ratio("[.,;:!?]{2,}")}) * 10) * 0.1 + " +
         s"least(1.0, ($mix) * 10) * 0.15", 6)
  }

  /** DataFrame-generic core: expects (doc_id, text). */
  def textGarbageScoreDf(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id") +:
        garbageRatios.map { case (n0, c) => c.as(n0) }: _*)
      .withColumn("garbage_score",
        r(least(lit(1.0), col("nonascii_ratio") * 10) * 0.45 +
          least(lit(1.0), col("midcase_ratio") * 30) * 0.3 +
          least(lit(1.0), col("punctrun_ratio") * 10) * 0.1 +
          least(lit(1.0), col("mix_ratio") * 10) * 0.15, 6))
      .withColumn("is_garbage", col("garbage_score") > GarbageThreshold)
      .orderBy(col("doc_id"))
  }

  val textGarbageScoreSql: String = {
    def ratio(pat: String) =
      sqlR(s"len(regexp_extract_all(text, '$pat')) / greatest(CAST(length(text) AS DOUBLE), 1.0)", 6)
    val mix =
      sqlR("len(regexp_extract_all(lower(text), '[a-z][0-9]+[a-z]')) / greatest(CAST(length(text) AS DOUBLE), 1.0)", 6)
    val score = sqlR(
      "least(1.0, nonascii_ratio * 10) * 0.45 + " +
      "least(1.0, midcase_ratio * 30) * 0.3 + " +
      "least(1.0, punctrun_ratio * 10) * 0.1 + " +
      "least(1.0, mix_ratio * 10) * 0.15", 6)
    s"""WITH f AS (
       |  SELECT doc_id,
       |         ${ratio("[^ -~]")} AS nonascii_ratio,
       |         ${ratio("[a-z][A-Z]")} AS midcase_ratio,
       |         ${ratio("[.,;:!?]{2,}")} AS punctrun_ratio,
       |         $mix AS mix_ratio
       |  FROM documents)
       |SELECT doc_id, nonascii_ratio, midcase_ratio, punctrun_ratio, mix_ratio,
       |       $score AS garbage_score,
       |       $score > $GarbageThreshold AS is_garbage
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Mergeable per-source garbage registers: doc count, over-threshold
    * count, and the decimal-exact sum of the 6dp per-doc score — all
    * merge by addition, so this stage is also the #281 streaming state
    * (the #238 doc-quality discipline applied to the garbage screen). */
  private[graft] def garbageRegisters(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(garbageScoreCol > GarbageThreshold, 1L).otherwise(0L))
             .as("n_garbage"),
           dsum(garbageScoreCol).as("g_sum"))

  /** Per-source mean score + garbage share over the ≤|sources|
    * register table. */
  private[graft] def garbageMixFinalize(regs: DataFrame): DataFrame =
    regs.select(col("source"), col("n_docs"), col("n_garbage"),
                r(col("g_sum") / col("n_docs"), 6).as("mean_garbage"),
                r(col("n_garbage") / col("n_docs").cast("double"), 6)
                  .as("garbage_share"))
      .orderBy(col("source"))

  /** #281's oracle: the per-source rollup of the shared #222 score
    * fragment, recomputed relationally. */
  val garbageMixSql: String =
    s"""WITH g AS (SELECT source, ($garbageScoreSqlFrag) AS gs FROM documents)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN gs > $GarbageThreshold THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_garbage,
       |       ${sqlR(s"${sqlSum("gs")} / count(*)", 6)} AS mean_garbage,
       |       ${sqlR(s"sum(CASE WHEN gs > $GarbageThreshold THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 6)} AS garbage_share
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------- #223 events_attribution_position

  /** #223 events_attribution_position: POSITION-BASED conversion credit
    * per channel — each converting user's pre-purchase path (the #159
    * derivation: ordered event types cut at the first 'purchase')
    * graded under the four standard rules side by side: first-touch,
    * last-touch, linear (1/n each), and U-shaped (40% first, 40% last,
    * 20% split across the middle). The heuristic panel read NEXT TO
    * #159's model-based removal effects: when the Markov attribution
    * disagrees with every position rule, the path data (not the model)
    * is usually broken, and budget owners reason in these rules'
    * units.
    *
    * Scale shape: per-user path assembly is one sorted-collect
    * aggregation (bounded by events-per-user, the #63 contract); the
    * credit fan-out is one posexplode with per-row closed-form credit
    * expressions; one groupBy(channel) ends it. Each user converts at
    * most once here (first purchase) — multi-conversion splitting is a
    * documented variant, not a different shape. */
  def eventsAttributionPosition(s: SparkSession, dir: String): DataFrame =
    eventsAttributionPositionDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (user_id, ts, event_id,
    * event_type). */
  def eventsAttributionPositionDf(ev: DataFrame): DataFrame = {
    val paths = ev.groupBy(col("user_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("ts"), col("event_id"),
                                       col("event_type")))),
        x => x("event_type")).as("arr"))
    val channels = paths
      .select(expr("array_position(arr, 'purchase')").as("pos"), col("arr"))
      .filter(col("pos") > 0)
      .select(expr("slice(arr, 1, CAST(pos AS INT) - 1)").as("channels"))
      .filter(size(col("channels")) > 0)
      .withColumn("len", size(col("channels")).cast("long"))
    val fan = channels
      .select(col("len"), posexplode(col("channels")).as(Seq("p0", "channel")))
      .withColumn("pos", col("p0") + 1)
    val ushape =
      when(col("len") === 1, lit(1.0))
        .when(col("len") === 2, lit(0.5))
        .when(col("pos") === 1 || col("pos") === col("len"), lit(0.4))
        .otherwise(r(lit(0.2) / (col("len") - 2), 6))
    fan
      .withColumn("linear", r(lit(1.0) / col("len"), 6))
      .withColumn("ushape", when(col("len") <= 2, ushape).otherwise(r(ushape, 6)))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
           sum(when(col("pos") === 1, 1L).otherwise(0L)).as("first_touch"),
           sum(when(col("pos") === col("len"), 1L).otherwise(0L)).as("last_touch"),
           r(dsum(col("linear")), 6).as("linear_credit"),
           r(dsum(col("ushape")), 6).as("ushape_credit"))
      .orderBy(col("channel"))
  }

  val eventsAttributionPositionSql: String = {
    val ushape =
      s"""CASE WHEN len = 1 THEN 1.0
         |     WHEN len = 2 THEN 0.5
         |     WHEN pos = 1 OR pos = len THEN 0.4
         |     ELSE ${sqlR("0.2 / (len - 2)", 6)} END""".stripMargin
    s"""WITH paths AS (
       |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS arr
       |  FROM events GROUP BY 1),
       |cut AS (
       |  SELECT arr[1:pos-1] AS channels
       |  FROM (SELECT arr, list_position(arr, 'purchase') AS pos FROM paths)
       |  WHERE pos IS NOT NULL AND pos > 1),
       |fan AS (
       |  SELECT CAST(len(channels) AS BIGINT) AS len,
       |         unnest(channels) AS channel,
       |         unnest(range(1, len(channels) + 1)) AS pos
       |  FROM cut),
       |credit AS (
       |  SELECT channel, pos, len,
       |         ${sqlR("1.0 / len", 6)} AS linear,
       |         CASE WHEN len <= 2 THEN ($ushape)
       |              ELSE ${sqlR(s"($ushape)", 6)} END AS ushape
       |  FROM fan)
       |SELECT channel, count(*) AS n_touches,
       |       CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS first_touch,
       |       CAST(sum(CASE WHEN pos = len THEN 1 ELSE 0 END) AS BIGINT)
       |         AS last_touch,
       |       ${sqlR(sqlSum("linear"), 6)} AS linear_credit,
       |       ${sqlR(sqlSum("ushape"), 6)} AS ushape_credit
       |FROM credit GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --------------------------------------------------- #224 text_code_detect

  /** Flag threshold for the code-likeness score. */
  val CodeThreshold = 0.5

  private[graft] val CodeKeywords = Seq(
    "def", "return", "import", "if", "else", "for", "while", "var", "val",
    "function", "class", "void", "int", "null")

  /** #224 text_code_detect: the CODE-vs-PROSE router — per document,
    * the four signals that separate source code from natural language
    * (brace/semicolon density, code-keyword token share, camelCase and
    * snake_case identifier density) combined into one fixed IEEE score.
    * A pretraining pipeline ROUTES on this before anything else: code
    * goes to its own dedup (#24i spans beat shingles), its own quality
    * rules (#24j's stopword/punctuation gates would reject all of it),
    * and its own mixing budget (#74) — misrouted code poisons the
    * prose quality curve (#132) and vice versa.
    *
    * Scale shape: map-only regexp counts + one higher-order token
    * filter — one scan, no shuffle, the #222 discipline. */
  def textCodeDetect(s: SparkSession, dir: String): DataFrame =
    textCodeDetectDf(Tables.documents(s, dir))

  /** The four code signals — shared with the #266 disposition gate;
    * same zero-length clamp as [[garbageRatios]]. */
  private[graft] def codeRatios: Seq[(String, Column)] = {
    val len = greatest(length(col("text")).cast("double"), lit(1.0))
    val toks = lowerTokens(col("text"))
    Seq("brace_ratio" -> r(regexp_count(col("text"), lit("[{}();=]")) / len, 6),
        "keyword_ratio" ->
          r(markerCount(toks, CodeKeywords) / size(toks).cast("double"), 6),
        "camel_ratio" ->
          r(regexp_count(col("text"), lit("[a-z][A-Z][a-z]")) / len, 6),
        "snake_ratio" -> r(regexp_count(col("text"), lit("[a-z]_[a-z]")) / len, 6))
  }

  /** The #224 score as one self-contained column. */
  private[graft] def codeScoreCol: Column = {
    val m = codeRatios.toMap
    r(least(lit(1.0), m("brace_ratio") * 20) * 0.4 +
      least(lit(1.0), m("keyword_ratio") * 10) * 0.3 +
      least(lit(1.0), m("camel_ratio") * 50) * 0.15 +
      least(lit(1.0), m("snake_ratio") * 50) * 0.15, 6)
  }

  /** The #224 score as one self-contained DuckDB fragment. */
  private[graft] val codeScoreSqlFrag: String = {
    val len = "greatest(CAST(length(text) AS DOUBLE), 1.0)"
    val kws = CodeKeywords.map("'" + _ + "'").mkString(",")
    val brace = sqlR(s"len(regexp_extract_all(text, '[{}();=]')) / $len", 6)
    val kw = sqlR(s"len(list_filter(string_split(lower(trim(text)), ' '), t -> t IN ($kws))) / CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE)", 6)
    val camel = sqlR(s"len(regexp_extract_all(text, '[a-z][A-Z][a-z]')) / $len", 6)
    val snake = sqlR(s"len(regexp_extract_all(text, '[a-z]_[a-z]')) / $len", 6)
    sqlR(s"least(1.0, ($brace) * 20) * 0.4 + least(1.0, ($kw) * 10) * 0.3 + " +
         s"least(1.0, ($camel) * 50) * 0.15 + least(1.0, ($snake) * 50) * 0.15", 6)
  }

  /** DataFrame-generic core: expects (doc_id, text). */
  def textCodeDetectDf(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id") +:
        codeRatios.map { case (n0, c) => c.as(n0) }: _*)
      .withColumn("code_score",
        r(least(lit(1.0), col("brace_ratio") * 20) * 0.4 +
          least(lit(1.0), col("keyword_ratio") * 10) * 0.3 +
          least(lit(1.0), col("camel_ratio") * 50) * 0.15 +
          least(lit(1.0), col("snake_ratio") * 50) * 0.15, 6))
      .withColumn("is_code", col("code_score") > CodeThreshold)
      .orderBy(col("doc_id"))
  }

  val textCodeDetectSql: String = {
    val kws = CodeKeywords.map("'" + _ + "'").mkString(",")
    val score = sqlR(
      "least(1.0, brace_ratio * 20) * 0.4 + " +
      "least(1.0, keyword_ratio * 10) * 0.3 + " +
      "least(1.0, camel_ratio * 50) * 0.15 + " +
      "least(1.0, snake_ratio * 50) * 0.15", 6)
    s"""WITH f AS (
       |  SELECT doc_id,
       |         ${sqlR("len(regexp_extract_all(text, '[{}();=]')) / greatest(CAST(length(text) AS DOUBLE), 1.0)", 6)} AS brace_ratio,
       |         ${sqlR(s"len(list_filter(string_split(lower(trim(text)), ' '), t -> t IN ($kws))) / CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE)", 6)} AS keyword_ratio,
       |         ${sqlR("len(regexp_extract_all(text, '[a-z][A-Z][a-z]')) / greatest(CAST(length(text) AS DOUBLE), 1.0)", 6)} AS camel_ratio,
       |         ${sqlR("len(regexp_extract_all(text, '[a-z]_[a-z]')) / greatest(CAST(length(text) AS DOUBLE), 1.0)", 6)} AS snake_ratio
       |  FROM documents)
       |SELECT doc_id, brace_ratio, keyword_ratio, camel_ratio, snake_ratio,
       |       $score AS code_score,
       |       $score > $CodeThreshold AS is_code
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
