package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Round-6 batch-31 operators (SURVEY §2 #229-#232): time-split profile
  * drift, multi-level changepoint segmentation, instruction-format
  * routing, and the ANN index shard plan.
  */
object Round6Ops14 {

  // ------------------------------------------------- #229 dq_profile_drift

  /** The audited fact columns and their kinds. */
  private[graft] val DriftCols: Seq[(String, String)] = Seq(
    "value" -> "numeric", "user_id" -> "numeric",
    "event_type" -> "string", "props" -> "string")

  /** #229 dq_profile_drift: the #200 profile DIFFERENCED across time —
    * events split at their midpoint date into two halves, every column
    * profiled per half (rows, null rate, exact distincts; mean/sd for
    * the metric column) and the drift metrics a feed review reads:
    * volume ratio, distinct-count ratio, null-rate delta, and the mean
    * shift in first-half σ units. #200 says "is today's snapshot
    * sane"; this says "is the feed CHANGING" — schema-silent upstream
    * migrations (an enum gaining values, an ID range jumping, a metric
    * quietly rescaled) all land in these four ratios first.
    *
    * Scale shape: ONE aggregate over the dated scan computes both
    * halves via conditional sums (the #205 discipline; the multi-
    * distinct pairs plan as Spark's Expand, the honest exact price —
    * approx_count_distinct is the extreme-scale drop-in); the long
    * readout is a single explode of the 1-row result. */
  def dqProfileDrift(s: SparkSession, dir: String): DataFrame =
    dqProfileDriftDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects the events schema. */
  def dqProfileDriftDf(ev: DataFrame): DataFrame = {
    val dated = ev.withColumn("d", to_date(col("ts")))
    val bounds = dated.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
      .select(date_add(col("dmin"),
        (datediff(col("dmax"), col("dmin")) / 2).cast("int")).as("mid"))
    val tagged = dated.crossJoin(broadcast(bounds))
      .withColumn("h1", col("d") <= col("mid"))
    val aggs: Seq[Column] =
      Seq(sum(when(col("h1"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("h1"), 1L).otherwise(0L)).as("n2"),
          dsum(when(col("h1"), col("value"))).as("sv1"),
          dsum(when(!col("h1"), col("value"))).as("sv2"),
          dsum(when(col("h1"), col("value") * col("value"))).as("svv1")) ++
      DriftCols.flatMap { case (c, _) =>
        Seq(count(when(col("h1"), col(c))).as(s"cnt1_$c"),
            count(when(!col("h1"), col(c))).as(s"cnt2_$c"),
            countDistinct(when(col("h1"), col(c))).as(s"nd1_$c"),
            countDistinct(when(!col("h1"), col(c))).as(s"nd2_$c"))
      }
    val m = tagged.agg(aggs.head, aggs.tail: _*)
    val mean1 = col("sv1") / col("cnt1_value")
    val mean2 = col("sv2") / col("cnt2_value")
    val sd1 = sqrt(greatest(lit(0.0),
      (col("svv1") - col("sv1") * col("sv1") / col("cnt1_value")) /
        (col("cnt1_value") - 1)))
    val rows = DriftCols.map { case (c, kind) =>
      struct(
        lit(c).as("col_name"), lit(kind).as("kind"),
        col(s"cnt1_$c").as("cnt1"), col(s"cnt2_$c").as("cnt2"),
        col(s"nd1_$c").as("nd1"), col(s"nd2_$c").as("nd2"),
        r((col("n1") - col(s"cnt1_$c")) / col("n1").cast("double"), 6)
          .as("null_rate1"),
        r((col("n2") - col(s"cnt2_$c")) / col("n2").cast("double"), 6)
          .as("null_rate2"),
        (if (c == "value")
           when(sd1 > 0, r((mean2 - mean1) / sd1, 6)).otherwise(lit(0.0))
         else lit(null).cast("double")).as("mean_shift"))
    }
    m.select(col("n1"), col("n2"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_name"), col("p.kind"), col("n1"), col("n2"),
              r(col("n2") / col("n1").cast("double"), 6).as("volume_ratio"),
              col("p.nd1"), col("p.nd2"),
              r(col("p.nd2") / col("p.nd1").cast("double"), 6)
                .as("distinct_ratio"),
              r(col("p.null_rate2") - col("p.null_rate1"), 6)
                .as("null_rate_delta"),
              col("p.mean_shift"))
      .orderBy(col("col_name"))
  }

  val dqProfileDriftSql: String = {
    val aggs =
      Seq("CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS n1",
          "CAST(sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS BIGINT) AS n2",
          s"${sqlSum("CASE WHEN h1 THEN value END")} AS sv1",
          s"${sqlSum("CASE WHEN NOT h1 THEN value END")} AS sv2",
          s"${sqlSum("CASE WHEN h1 THEN value * value END")} AS svv1") ++
      DriftCols.flatMap { case (c, _) =>
        Seq(s"count(CASE WHEN h1 THEN $c END) AS cnt1_$c",
            s"count(CASE WHEN NOT h1 THEN $c END) AS cnt2_$c",
            s"count(DISTINCT CASE WHEN h1 THEN $c END) AS nd1_$c",
            s"count(DISTINCT CASE WHEN NOT h1 THEN $c END) AS nd2_$c")
      }
    val mean1 = "(sv1 / cnt1_value)"
    val mean2 = "(sv2 / cnt2_value)"
    val sd1 = "sqrt(greatest(0.0, (svv1 - sv1 * sv1 / cnt1_value) / (cnt1_value - 1)))"
    val sel = DriftCols.map { case (c, kind) =>
      val shift =
        if (c == "value")
          s"CASE WHEN $sd1 > 0 THEN ${sqlR(s"($mean2 - $mean1) / $sd1", 6)} ELSE 0.0 END"
        else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name, '$kind' AS kind,
         |       n1, n2,
         |       ${sqlR("n2 / CAST(n1 AS DOUBLE)", 6)} AS volume_ratio,
         |       CAST(nd1_$c AS BIGINT) AS nd1, CAST(nd2_$c AS BIGINT) AS nd2,
         |       ${sqlR(s"nd2_$c / CAST(nd1_$c AS DOUBLE)", 6)} AS distinct_ratio,
         |       ${sqlR(
               s"(${sqlR(s"(n2 - cnt2_$c) / CAST(n2 AS DOUBLE)", 6)}) - " +
               s"(${sqlR(s"(n1 - cnt1_$c) / CAST(n1 AS DOUBLE)", 6)})", 6)}
         |         AS null_rate_delta,
         |       $shift AS mean_shift
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH dated AS (
       |  SELECT *, CAST(ts AS DATE) AS d FROM events),
       |mid AS (
       |  SELECT min(d) + CAST(datediff('day', min(d), max(d)) // 2 AS INT) AS mid
       |  FROM dated),
       |tagged AS (
       |  SELECT dated.*, dated.d <= mid.mid AS h1 FROM dated CROSS JOIN mid),
       |m AS (
       |  SELECT ${aggs.mkString(",\n         ")}
       |  FROM tagged)
       |$sel
       |ORDER BY col_name""".stripMargin
  }

  // --------------------------------------------- #230 ts_changepoint_multi

  /** Minimum segment length for a level-2 split. */
  val CpMinSeg = 4

  /** #230 ts_changepoint_multi: BINARY SEGMENTATION — the #11f CUSUM
    * argmax applied recursively: level 1 finds each key's strongest
    * mean break, level 2 re-runs the identical statistic inside the
    * left and right segments, yielding up to three ordered breaks per
    * key. The multi-regime answer #11f can't give (a series that
    * steps up twice has its level-1 break mask the second), and the
    * retrospective complement of #136/#143's sequential alarms.
    * Segments shorter than [[CpMinSeg]] days don't split (a 2-day
    * "segment" always has a perfect break). Deterministic: argmax
    * ties break on the earlier date, exactly #11f's rule.
    *
    * Scale shape: two rounds of the #11f window family — every window
    * keys on (user_id [, segment]), so each level is one exchange+sort
    * bounded by days-per-key; no driver loop, no collect (the level
    * count is the fixed recursion depth, like #80's iterations). */
  def tsChangepointMulti(s: SparkSession, dir: String): DataFrame =
    tsChangepointMultiDf(Mhw.daily(s, dir))

  /** One CUSUM-argmax pass over (user_id, seg, d, sst): the #11f math
    * with a composite key. */
  private def cusumArgmax(dl: DataFrame): DataFrame = {
    val dec = "decimal(38,10)"
    val wAll = Window.partitionBy("user_id", "seg")
    val wOrd = wAll.orderBy("d")
    dl
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("mean",
        r(sum(col("sst").cast(dec)).over(wAll).cast("double") / col("n"), 6))
      .withColumn("prefix",
        sum(col("sst").cast(dec))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cusum", r(col("prefix") - col("rn") * col("mean"), 6))
      .withColumn("rk",
        row_number().over(wAll.orderBy(abs(col("cusum")).desc, col("d"))))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("seg"), col("d").as("cp_date"),
              col("cusum").as("cp_cusum"), col("n").as("n_days"))
  }

  /** DataFrame-generic core: expects (user_id, d DATE, sst DOUBLE). */
  def tsChangepointMultiDf(dl0: DataFrame): DataFrame = {
    val dl = dl0.select(col("user_id"), col("d"), col("sst"))
    val l1 = cusumArgmax(dl.withColumn("seg", lit("all")))
    val cp1 = l1.select(col("user_id"), col("cp_date").as("cp1"))
    val seg2 = dl.join(graft.Hints.keyDim(cp1), Seq("user_id"))
      .withColumn("seg",
        when(col("d") <= col("cp1"), lit("left")).otherwise(lit("right")))
      .drop("cp1")
    val l2 = cusumArgmax(seg2).filter(col("n_days") >= CpMinSeg)
    l1.withColumn("level", lit(1))
      .unionByName(l2.withColumn("level", lit(2)))
      .select(col("user_id"), col("level"), col("seg"), col("cp_date"),
              col("cp_cusum"), col("n_days"))
      .orderBy(col("user_id"), col("level"), col("seg"))
  }

  val tsChangepointMultiSql: String = {
    def pass(src: String, out: String) =
      s"""${out}_s AS (
         |  SELECT user_id, seg, d, sst,
         |         count(*) OVER (PARTITION BY user_id, seg) AS n,
         |         ${sqlR("CAST(sum(CAST(sst AS DECIMAL(38,10))) OVER (PARTITION BY user_id, seg) AS DOUBLE) / count(*) OVER (PARTITION BY user_id, seg)", 6)} AS mean,
         |         CAST(sum(CAST(sst AS DECIMAL(38,10))) OVER (
         |           PARTITION BY user_id, seg ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS prefix,
         |         row_number() OVER (PARTITION BY user_id, seg ORDER BY d) AS rn
         |  FROM $src),
         |${out}_c AS (
         |  SELECT user_id, seg, d, n,
         |         ${sqlR("prefix - rn * mean", 6)} AS cusum
         |  FROM ${out}_s),
         |$out AS (
         |  SELECT user_id, seg, d AS cp_date, cusum AS cp_cusum, n AS n_days
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY user_id, seg ORDER BY abs(cusum) DESC, d) AS rk
         |        FROM ${out}_c)
         |  WHERE rk = 1)"""
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d,
       |         ${sqlAvg("value", 6)} AS sst
       |  FROM events GROUP BY 1, 2),
       |lvl1_in AS (SELECT user_id, d, sst, 'all' AS seg FROM daily),
       |${pass("lvl1_in", "l1")},
       |lvl2_in AS (
       |  SELECT daily.user_id, daily.d, daily.sst,
       |         CASE WHEN daily.d <= l1.cp_date THEN 'left' ELSE 'right' END AS seg
       |  FROM daily JOIN l1 ON l1.user_id = daily.user_id),
       |${pass("lvl2_in", "l2")}
       |SELECT user_id, 1 AS level, seg, cp_date, cp_cusum,
       |       CAST(n_days AS BIGINT) AS n_days FROM l1
       |UNION ALL
       |SELECT user_id, 2 AS level, seg, cp_date, cp_cusum,
       |       CAST(n_days AS BIGINT) AS n_days FROM l2 WHERE n_days >= $CpMinSeg
       |ORDER BY user_id, level, seg""".stripMargin
  }

  // ------------------------------------------ #231 doc_instruction_detect

  /** Flag threshold for the instruction-format score. */
  val InstructionThreshold = 0.4

  private[graft] val ImperativeLeads = Seq(
    "write", "explain", "list", "describe", "give", "create", "summarize",
    "translate", "answer", "provide")

  /** #231 doc_instruction_detect: the INSTRUCTION-FORMAT router — per
    * document, the four signals of Q&A / instruction-tuning shaped
    * text (Q:/A:-style labels, question-mark density, imperative lead
    * verbs, numbered-step lines) in one fixed IEEE score. The third
    * member of the routing family (#224 code, #222 garbage): SFT-style
    * data mixed silently into a pretraining stream shifts the format
    * distribution (and may be benchmark-derived — the #24d
    * contamination class), so a corpus build routes it to its own
    * bucket with its own budget.
    *
    * Scale shape: map-only regexp counts + one higher-order token
    * filter — one scan, no shuffle, the #222/#224 discipline. */
  def docInstructionDetect(s: SparkSession, dir: String): DataFrame =
    docInstructionDetectDf(Tables.documents(s, dir))

  /** The four instruction signals — shared with the #266 gate. */
  private[graft] def instructionRatios: Seq[(String, Column)] = {
    val toks = lowerTokens(col("text"))
    val nt = size(toks).cast("double")
    Seq("qa_ratio" -> r(regexp_count(lower(col("text")),
          lit("(?:^|\\s)(?:q|a|question|answer)\\s*:")) / nt, 6),
        "q_ratio" -> r(regexp_count(col("text"), lit("\\?")) / nt, 6),
        "imp_ratio" -> r(markerCount(toks, ImperativeLeads) / nt, 6),
        "num_ratio" -> r(regexp_count(col("text"),
          lit("(?m)^\\s*\\d+[.)]")) / nt, 6))
  }

  /** The #231 score as one self-contained column. */
  private[graft] def instructionScoreCol: Column = {
    val m = instructionRatios.toMap
    r(least(lit(1.0), m("qa_ratio") * 20) * 0.35 +
      least(lit(1.0), m("q_ratio") * 10) * 0.25 +
      least(lit(1.0), m("imp_ratio") * 10) * 0.25 +
      least(lit(1.0), m("num_ratio") * 20) * 0.15, 6)
  }

  /** The #231 score as one self-contained DuckDB fragment. */
  private[graft] val instructionScoreSqlFrag: String = {
    val kws = ImperativeLeads.map("'" + _ + "'").mkString(",")
    val nt = "CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE)"
    val qa = sqlR(s"len(regexp_extract_all(lower(text), '(?:^|\\s)(?:q|a|question|answer)\\s*:')) / $nt", 6)
    val q = sqlR(s"len(regexp_extract_all(text, '\\?')) / $nt", 6)
    val imp = sqlR(s"len(list_filter(string_split(lower(trim(text)), ' '), t -> t IN ($kws))) / $nt", 6)
    val num = sqlR(s"len(regexp_extract_all(text, '(?m)^\\s*\\d+[.)]')) / $nt", 6)
    sqlR(s"least(1.0, ($qa) * 20) * 0.35 + least(1.0, ($q) * 10) * 0.25 + " +
         s"least(1.0, ($imp) * 10) * 0.25 + least(1.0, ($num) * 20) * 0.15", 6)
  }

  /** DataFrame-generic core: expects (doc_id, text). */
  def docInstructionDetectDf(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id") +:
        instructionRatios.map { case (n0, c) => c.as(n0) }: _*)
      .withColumn("instruction_score",
        r(least(lit(1.0), col("qa_ratio") * 20) * 0.35 +
          least(lit(1.0), col("q_ratio") * 10) * 0.25 +
          least(lit(1.0), col("imp_ratio") * 10) * 0.25 +
          least(lit(1.0), col("num_ratio") * 20) * 0.15, 6))
      .withColumn("is_instruction",
        col("instruction_score") > InstructionThreshold)
      .orderBy(col("doc_id"))
  }

  val docInstructionDetectSql: String = {
    val kws = ImperativeLeads.map("'" + _ + "'").mkString(",")
    val nt = "CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE)"
    val score = sqlR(
      "least(1.0, qa_ratio * 20) * 0.35 + " +
      "least(1.0, q_ratio * 10) * 0.25 + " +
      "least(1.0, imp_ratio * 10) * 0.25 + " +
      "least(1.0, num_ratio * 20) * 0.15", 6)
    s"""WITH f AS (
       |  SELECT doc_id,
       |         ${sqlR(s"len(regexp_extract_all(lower(text), '(?:^|\\s)(?:q|a|question|answer)\\s*:')) / $nt", 6)} AS qa_ratio,
       |         ${sqlR(s"len(regexp_extract_all(text, '\\?')) / $nt", 6)} AS q_ratio,
       |         ${sqlR(s"len(list_filter(string_split(lower(trim(text)), ' '), t -> t IN ($kws))) / $nt", 6)} AS imp_ratio,
       |         ${sqlR(s"len(regexp_extract_all(text, '(?m)^\\s*\\d+[.)]')) / $nt", 6)} AS num_ratio
       |  FROM documents)
       |SELECT doc_id, qa_ratio, q_ratio, imp_ratio, num_ratio,
       |       $score AS instruction_score,
       |       $score > $InstructionThreshold AS is_instruction
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------- #232 ann_shard_plan

  /** Serving shards the IVF cells are packed onto. */
  val PlanShards = 4

  /** #232 ann_shard_plan: the ANN index SHARD PLAN — the #31b IVF
    * cells sized by their vector populations and packed onto
    * [[PlanShards]] serving shards by SNAKE DRAFT over the size rank
    * (rank 1..k boustrophedon across shards: 1→s0, …, S→s{S−1},
    * S+1→s{S−1}, …), the deterministic one-pass balancer whose maximum
    * load is within one cell of round-robin-by-size. The deployment
    * step between building the index (#31b) and serving it: cells are
    * the co-access unit (a probe touches whole cells), so shards must
    * balance VECTORS not cell counts, or the hot shard sets the p99.
    * Next to #91's shard_pack (which packs documents by token budget),
    * this packs an INDEX by access weight.
    *
    * Scale shape: the k-means model is model-sized (#31b's contract),
    * assignment is map-only, cell sizes are one groupBy to ≤k rows,
    * and the rank/snake/load algebra is windows over that model-sized
    * table. */
  def annShardPlan(s: SparkSession, dir: String,
                   nCells: Int = 16, iters: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.ensure(s)
    val corpus = Similarity.pinnedEmbeddings(s, dir)
    val centroids = Similarity.centroidsCached(s, (dir, "full"))(corpus, nCells, iters)
    val cells = Similarity.assignNearest(corpus, centroids)
      .groupBy(col("cluster").as("cell_id"))
      .agg(count(lit(1)).as("n_vecs"))
    val wRank = Window.orderBy(col("n_vecs").desc, col("cell_id"))
    val r0 = (col("rank") - 1) % (2 * PlanShards)
    val snake = when(r0 < PlanShards, r0)
      .otherwise(lit(2 * PlanShards - 1) - r0)
    val planned = cells
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("shard", snake.cast("long"))
    val wShard = Window.partitionBy(col("shard"))
    val wAll = Window.partitionBy()
    planned
      .withColumn("shard_load", sum(col("n_vecs")).over(wShard))
      .withColumn("load_share",
        r(col("shard_load") / sum(col("n_vecs")).over(wAll).cast("double"), 6))
      .select(col("cell_id"), col("n_vecs"), col("rank"), col("shard"),
              col("shard_load"), col("load_share"))
      .orderBy(col("rank"))
  }

  def annShardPlanSql(nCells: Int = 16, iters: Int = 3): String =
    Similarity.ivfChainSql(nCells, iters) +
    s""",
       |cells AS (
       |  SELECT cl AS cell_id, count(*) AS n_vecs FROM bucketed GROUP BY 1),
       |ranked AS (
       |  SELECT cell_id, n_vecs,
       |         row_number() OVER (ORDER BY n_vecs DESC, cell_id) AS rank
       |  FROM cells),
       |planned AS (
       |  SELECT cell_id, n_vecs, CAST(rank AS BIGINT) AS rank,
       |         CAST(CASE WHEN (rank - 1) % ${2 * PlanShards} < $PlanShards
       |              THEN (rank - 1) % ${2 * PlanShards}
       |              ELSE ${2 * PlanShards - 1} - (rank - 1) % ${2 * PlanShards}
       |              END AS BIGINT) AS shard
       |  FROM ranked)
       |SELECT cell_id, n_vecs, rank, shard,
       |       CAST(sum(n_vecs) OVER (PARTITION BY shard) AS BIGINT) AS shard_load,
       |       ${sqlR("sum(n_vecs) OVER (PARTITION BY shard) / CAST(sum(n_vecs) OVER () AS DOUBLE)", 6)} AS load_share
       |FROM planned ORDER BY rank""".stripMargin
}
