package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-17/18/19 analytics (SURVEY §2 #178-#187): customer
  * segment migration, Heaps'-law vocabulary growth, unit-price
  * dispersion, discount elasticity, session-path discovery, sampling
  * temperature, velocity checks, and dormancy accounting.
  */
object Round6Ops5 {

  // ------------------------------------------ #178 orders_rfm_migration

  /** #178 orders_rfm_migration: customer SEGMENT-MIGRATION matrix —
    * split the order history at its date midpoint, grade each customer
    * per half (HIGH: spend above that half's mean customer spend; LOW:
    * below; ABSENT: no orders), and count every (first-half segment →
    * second-half segment) flow with its share. The lifecycle readout a
    * CRM team actually acts on: LOW/HIGH→ABSENT is churn, ABSENT→* is
    * acquisition, LOW→HIGH is upgrade — the matrix #92's static RFM
    * grades can't show because it has no time axis.
    *
    * Scale shape: two per-customer aggregations (one scan each half)
    * joined full-outer on the customer key; each half's mean spend is
    * ONE broadcast scalar (never a quantile over customer-cardinality
    * rows); the matrix is a ≤3×3 model table with a window share. */
  def ordersRfmMigration(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
      col("o_totalprice"))
    val midRow = o.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    val om = o.crossJoin(broadcast(midRow))
    def half(pred: org.apache.spark.sql.Column, tag: String): DataFrame = {
      val spend = om.filter(pred).groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as(s"spend_$tag"))
      val mean = spend.agg(davg(col(s"spend_$tag"), 6).as(s"mean_$tag"))
      spend.crossJoin(broadcast(mean))
        .select(col("o_custkey"),
                when(col(s"spend_$tag") > col(s"mean_$tag"), lit("HIGH"))
                  .otherwise(lit("LOW")).as(s"seg_$tag"))
    }
    val a = half(col("day") <= col("mid"), "a")
    val b = half(col("day") > col("mid"), "b")
    val w = Window.partitionBy()
    a.join(b, Seq("o_custkey"), "full_outer")
      .select(coalesce(col("seg_a"), lit("ABSENT")).as("seg_a"),
              coalesce(col("seg_b"), lit("ABSENT")).as("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("share", r(col("n_customers") / sum(col("n_customers")).over(w), 6))
      .orderBy(col("seg_a"), col("seg_b"))
  }

  val ordersRfmMigrationSql: String = {
    def half(pred: String, tag: String) =
      s"""sp$tag AS (
         |  SELECT o_custkey, ${sqlSum("o_totalprice")} AS spend
         |  FROM o CROSS JOIN mid WHERE $pred GROUP BY 1),
         |m$tag AS (SELECT ${sqlAvg("spend", 6)} AS mean_spend FROM sp$tag),
         |seg$tag AS (
         |  SELECT o_custkey,
         |         CASE WHEN spend > mean_spend THEN 'HIGH' ELSE 'LOW' END AS seg
         |  FROM sp$tag CROSS JOIN m$tag)""".stripMargin
    s"""WITH o AS (
       |  SELECT o_custkey,
       |         epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
       |         o_totalprice
       |  FROM orders),
       |mid AS (SELECT (min(day) + max(day)) // 2 AS mid FROM o),
       |${half("day <= mid", "a")},
       |${half("day > mid", "b")},
       |mat AS (
       |  SELECT COALESCE(a.seg, 'ABSENT') AS seg_a,
       |         COALESCE(b.seg, 'ABSENT') AS seg_b,
       |         count(*) AS n_customers
       |  FROM sega a FULL OUTER JOIN segb b USING (o_custkey)
       |  GROUP BY 1, 2)
       |SELECT seg_a, seg_b, n_customers,
       |       ${sqlR("n_customers / (sum(n_customers) OVER ())", 6)} AS share
       |FROM mat ORDER BY seg_a, seg_b""".stripMargin
  }

  // ------------------------------------------ #179 corpus_vocab_growth

  /** #179 corpus_vocab_growth: the Heaps'-law scaling curve — cumulative
    * distinct vocabulary vs cumulative token volume over ten
    * deterministic hash-ordered corpus deciles, plus the fitted Heaps
    * exponent β (V ≈ K·N^β, log-log OLS over the ten curve points).
    * THE "does more data still buy new language?" readout a
    * data-acquisition team plots before licensing the next crawl —
    * β ≈ 0.5 says the corpus is still fresh, β → 0 says vocabulary has
    * saturated and the next tranche is mostly repetition (#90 measures
    * duplication inflation; this measures novelty exhaustion).
    *
    * Scale shape: decile assignment is a map-only md5 of the doc id;
    * token volume is one |deciles|-key count; first-appearance decile
    * is one min-aggregate over the token vocabulary (the #131
    * min-inverted-index shape, no self-join); cumsums, the ln grid and
    * the OLS fold all run on the 10-row model spine. */
  def corpusVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val dec = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
                    16, 10).cast("long") % 10).cast("int").as("decile")
    val toks = Tables.documents(s, dir)
      .select(dec, explode(graft.functions.TextFunctions.lowerTokens(col("text")))
        .as("tok"))
      .filter(length(col("tok")) > 0)
    val occ = toks.groupBy(col("decile")).agg(count(lit(1)).as("n_occ"))
    val firstSeen = toks.groupBy(col("tok")).agg(min(col("decile")).as("decile"))
      .groupBy(col("decile")).agg(count(lit(1)).as("n_new"))
    val spine = s.range(10).select(col("id").cast("int").as("decile"))
    val wCum = Window.partitionBy().orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = spine
      .join(occ, Seq("decile"), "left").join(firstSeen, Seq("decile"), "left")
      .select(col("decile"),
              coalesce(col("n_occ"), lit(0L)).as("n_occ"),
              coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_tokens_cum", sum(col("n_occ")).over(wCum))
      .withColumn("vocab_cum", sum(col("n_new")).over(wCum))
      // empty leading deciles guard: ln(0) is NULL in Spark but an
      // ERROR in DuckDB — gate both engines identically and fit the
      // OLS on the valid-point count, not the spine size
      .withColumn("x", when(col("n_tokens_cum") > 0 && col("vocab_cum") > 0,
        r(log(col("n_tokens_cum").cast("double")), 6)))
      .withColumn("y", when(col("n_tokens_cum") > 0 && col("vocab_cum") > 0,
        r(log(col("vocab_cum").cast("double")), 6)))
    val w = Window.partitionBy()
    val n = count(col("x")).over(w).cast("double")
    val sx = sum(col("x").cast("decimal(38,10)")).over(w).cast("double")
    val sy = sum(col("y").cast("decimal(38,10)")).over(w).cast("double")
    val sxy = sum((col("x") * col("y")).cast("decimal(38,10)")).over(w).cast("double")
    val sxx = sum((col("x") * col("x")).cast("decimal(38,10)")).over(w).cast("double")
    curve
      .withColumn("heaps_beta",
        r((sxy - sx * sy / n) / (sxx - sx * sx / n), 6))
      .select(col("decile"), col("n_tokens_cum"), col("vocab_cum"),
              col("heaps_beta"))
      .orderBy(col("decile"))
  }

  val corpusVocabGrowthSql: String = {
    def dsumW(x: String) =
      s"CAST(sum(CAST(($x) AS DECIMAL(38,10))) OVER () AS DOUBLE)"
    s"""WITH toks AS (
       |  SELECT CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 10 AS INT) AS decile,
       |         t.t AS tok
       |  FROM documents, LATERAL (SELECT unnest(string_split(lower(trim(text)), ' ')) AS t) t
       |  WHERE length(t.t) > 0),
       |occ AS (SELECT decile, count(*) AS n_occ FROM toks GROUP BY 1),
       |fs AS (
       |  SELECT decile, count(*) AS n_new FROM (
       |    SELECT tok, min(decile) AS decile FROM toks GROUP BY 1)
       |  GROUP BY 1),
       |curve AS (
       |  SELECT s.decile,
       |         sum(COALESCE(o.n_occ, 0)) OVER (ORDER BY s.decile) AS n_tokens_cum,
       |         sum(COALESCE(f.n_new, 0)) OVER (ORDER BY s.decile) AS vocab_cum
       |  FROM (SELECT CAST(unnest(range(0, 10)) AS INT) AS decile) s
       |  LEFT JOIN occ o ON o.decile = s.decile
       |  LEFT JOIN fs f ON f.decile = s.decile),
       |xy AS (
       |  SELECT decile, n_tokens_cum, vocab_cum,
       |         CASE WHEN n_tokens_cum > 0 AND vocab_cum > 0
       |              THEN ${sqlR("ln(CAST(n_tokens_cum AS DOUBLE))", 6)} END AS x,
       |         CASE WHEN n_tokens_cum > 0 AND vocab_cum > 0
       |              THEN ${sqlR("ln(CAST(vocab_cum AS DOUBLE))", 6)} END AS y
       |  FROM curve)
       |SELECT decile, CAST(n_tokens_cum AS BIGINT) AS n_tokens_cum,
       |       CAST(vocab_cum AS BIGINT) AS vocab_cum,
       |       ${sqlR(
      s"(${dsumW("x * y")} - ${dsumW("x")} * ${dsumW("y")} / (CAST(count(x) OVER () AS DOUBLE)))" +
      s" / (${dsumW("x * x")} - ${dsumW("x")} * ${dsumW("x")} / (CAST(count(x) OVER () AS DOUBLE)))", 6)} AS heaps_beta
       |FROM xy ORDER BY decile""".stripMargin
  }

  // --------------------------------------- #180 lineitem_price_variance

  private[graft] val PriceVarMinLines = 5L

  /** #180 lineitem_price_variance: unit-price DISPERSION audit per part
    * — n, mean/sd/cv of extendedprice÷quantity, and the observed
    * extremes, for parts with ≥ 5 line items. The procurement screen
    * beside #167 (dup payments catch the same charge twice; this
    * catches the same PART billed at wildly different unit rates —
    * contract leakage, manual-entry errors, or a supplier quietly
    * repricing). cv is comparable across parts of any price level,
    * which is why the audit thresholds on it and not on sd.
    *
    * Scale shape: one map-only unit-price projection + one part-key
    * moment aggregation (decimal-exact sums, the #104 Welch moment
    * discipline); no joins, no windows — part-cardinality output. */
  def lineitemPriceVariance(s: SparkSession, dir: String): DataFrame = {
    val unit = (col("l_extendedprice") / col("l_quantity")).as("u")
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 0)
      .select(col("l_partkey"), unit)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
           dsum(col("u")).as("su"),
           dsum(col("u") * col("u")).as("suu"),
           r(min(col("u")), 6).as("min_unit"),
           r(max(col("u")), 6).as("max_unit"))
      .filter(col("n_lines") >= PriceVarMinLines)
      .withColumn("mean_unit", r(col("su") / col("n_lines"), 6))
      .withColumn("sd_unit", r(sqrt(greatest(lit(0.0),
        (col("suu") - col("n_lines") * col("mean_unit") * col("mean_unit")) /
          (col("n_lines") - 1))), 6))
      .withColumn("cv_unit",
        when(col("mean_unit") > 0, r(col("sd_unit") / col("mean_unit"), 6)))
      .select(col("l_partkey"), col("n_lines"), col("mean_unit"),
              col("sd_unit"), col("cv_unit"), col("min_unit"), col("max_unit"))
      .orderBy(col("l_partkey"))
  }

  val lineitemPriceVarianceSql: String = {
    val mean = sqlR("su / n_lines", 6)
    val sd = sqlR(s"sqrt(greatest(0.0, (suu - n_lines * ($mean) * ($mean)) / (n_lines - 1)))", 6)
    s"""WITH u AS (
       |  SELECT l_partkey, l_extendedprice / l_quantity AS u
       |  FROM lineitem WHERE l_quantity > 0),
       |m AS (
       |  SELECT l_partkey, count(*) AS n_lines,
       |         ${sqlSum("u")} AS su, ${sqlSum("u * u")} AS suu,
       |         ${sqlR("min(u)", 6)} AS min_unit, ${sqlR("max(u)", 6)} AS max_unit
       |  FROM u GROUP BY 1 HAVING count(*) >= $PriceVarMinLines)
       |SELECT l_partkey, n_lines, $mean AS mean_unit, $sd AS sd_unit,
       |       CASE WHEN $mean > 0 THEN ${sqlR(s"($sd) / ($mean)", 6)} END AS cv_unit,
       |       min_unit, max_unit
       |FROM m ORDER BY l_partkey""".stripMargin
  }

  // ------------------------------------ #182 part_discount_elasticity

  /** #182 part_discount_elasticity: per-brand OLS of quantity on
    * discount — slope (units gained per point of discount), intercept,
    * and r² over every line item of the brand. The merchandising
    * question behind #14's revenue roll-ups: does discounting MOVE
    * units for this brand, or just give margin away? (#88 fits robust
    * trends over time; this is the cross-sectional price-response fit.)
    *
    * Scale shape: one lineitem⋈part key-equi join (part is
    * SF-proportional — no broadcast assumption), then a |brands|-key
    * moment aggregation (decimal-exact Σx, Σy, Σxy, Σxx, Σyy); the
    * slope/r² algebra runs on the model-sized brand rollup. */
  def partDiscountElasticity(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_discount").as("x"),
              col("l_quantity").as("y"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
    val agg = joined.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("double").as("n"),
           dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
           dsum(col("x") * col("y")).as("sxy"),
           dsum(col("x") * col("x")).as("sxx"),
           dsum(col("y") * col("y")).as("syy"))
    val sxxC = col("sxx") - col("sx") * col("sx") / col("n")
    val syyC = col("syy") - col("sy") * col("sy") / col("n")
    val sxyC = col("sxy") - col("sx") * col("sy") / col("n")
    agg.select(col("p_brand"), col("n").cast("long").as("n_lines"),
               when(sxxC > 0, r(sxyC / sxxC, 6)).as("slope"),
               when(sxxC > 0,
                 r(col("sy") / col("n") - (sxyC / sxxC) * col("sx") / col("n"), 6))
                 .as("intercept"),
               when(sxxC > 0 && syyC > 0,
                 r(sxyC * sxyC / (sxxC * syyC), 6)).as("r2"))
      .orderBy(col("p_brand"))
  }

  val partDiscountElasticitySql: String = {
    val sxxC = s"(sxx - sx * sx / n)"
    val syyC = s"(syy - sy * sy / n)"
    val sxyC = s"(sxy - sx * sy / n)"
    s"""WITH j AS (
       |  SELECT p.p_brand, l.l_discount AS x, l.l_quantity AS y
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |m AS (
       |  SELECT p_brand, CAST(count(*) AS DOUBLE) AS n,
       |         ${sqlSum("x")} AS sx, ${sqlSum("y")} AS sy,
       |         ${sqlSum("x * y")} AS sxy, ${sqlSum("x * x")} AS sxx,
       |         ${sqlSum("y * y")} AS syy
       |  FROM j GROUP BY 1)
       |SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
       |       CASE WHEN $sxxC > 0 THEN ${sqlR(s"$sxyC / $sxxC", 6)} END AS slope,
       |       CASE WHEN $sxxC > 0
       |            THEN ${sqlR(s"sy / n - ($sxyC / $sxxC) * sx / n", 6)} END AS intercept,
       |       CASE WHEN $sxxC > 0 AND $syyC > 0
       |            THEN ${sqlR(s"$sxyC * $sxyC / ($sxxC * $syyC)", 6)} END AS r2
       |FROM m ORDER BY p_brand""".stripMargin
  }

  // ------------------------------------- #183 events_session_paths

  private[graft] val SessionPathTop = 20
  private[graft] val SessionPathLen = 3
  private[graft] val SessionGapS = 1800L

  /** #183 events_session_paths: top opening PATHS through the product —
    * sessions (the #16 30-minute-gap rule), each reduced to its first
    * three event types joined '>'-style, ranked by frequency with each
    * path's in-session conversion rate. The navigation-discovery
    * readout between #20b (a FIXED funnel checked in order) and #63
    * (full per-user paths, unranked): where do sessions actually start,
    * and which openings convert?
    *
    * Scale shape: the session assignment is the #16 per-user window
    * (bounded by events-per-user); path truncation is a bounded slice
    * of a per-session sorted collect (sessions are gap-bounded);
    * ranking is a sort+limit over the path-cardinality rollup —
    * typed-path cardinality is tiny (≤ |types|³). */
  def eventsSessionPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // THE #16 gap rule verbatim: truncated-second timestamps, break on
    // gap > 1800 s — so these sessions reconcile 1:1 with the #16
    // session table (a µs-precision rule would cut sub-second edges
    // differently)
    val secs = unix_timestamp(col("ts").cast("timestamp"))
    val sess = Tables.events(s, dir)
      .withColumn("prev_s", lag(secs, 1).over(w))
      .withColumn("brk",
        when(col("prev_s").isNull || secs - col("prev_s") > SessionGapS, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)))
    val paths = sess.groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
             slice(transform(sort_array(collect_list(
                     struct(col("ts"), col("event_id"), col("event_type")))),
                   x => x("event_type")), 1, SessionPathLen), ">").as("path"),
           max(when(col("event_type") === Round6Ops3.ConvType, 1).otherwise(0))
             .as("converted"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("converted")).cast("long").as("n_converted"))
      .withColumn("conv_rate", r(col("n_converted") / col("n_sessions"), 6))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(SessionPathTop)
  }

  val eventsSessionPathsSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
       |         CASE WHEN lag(floor(epoch(CAST(ts AS TIMESTAMP)))) OVER w IS NULL
       |                OR floor(epoch(CAST(ts AS TIMESTAMP))) -
       |                   lag(floor(epoch(CAST(ts AS TIMESTAMP)))) OVER w > $SessionGapS
       |              THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, event_type, ts,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged),
       |paths AS (
       |  SELECT user_id, session_id,
       |         array_to_string(list(event_type ORDER BY ts, event_id)[1:$SessionPathLen], '>') AS path,
       |         max(CASE WHEN event_type = '${Round6Ops3.ConvType}' THEN 1 ELSE 0 END) AS converted
       |  FROM sess GROUP BY 1, 2)
       |SELECT path, count(*) AS n_sessions,
       |       CAST(sum(converted) AS BIGINT) AS n_converted,
       |       ${sqlR("sum(converted) / count(*)", 6)} AS conv_rate
       |FROM paths GROUP BY 1
       |ORDER BY n_sessions DESC, path LIMIT $SessionPathTop""".stripMargin

  // ------------------------------------ #185 corpus_mix_temperature

  /** #185 corpus_mix_temperature: the SAMPLING-TEMPERATURE sweep for
    * corpus mixing (the mT5/XLM-R trick): per (lang, source) the
    * natural token share p and the renormalized sampling weight
    * p^τ / Σ p^τ at τ ∈ {1, 0.75, 0.5, 0.25}, plus each weight's
    * effective oversampling epochs (weight/share). τ = 1 is
    * natural sampling, lower τ flattens toward uniform — the table a
    * mixture owner reads to pick how hard to boost tail languages
    * before #77 allocates the token budget (#74 ships the fixed
    * τ = 0.5 point; this is the curve it sits on).
    *
    * Portability: the τ grid is deliberately dyadic — p^0.5 = sqrt(p),
    * p^0.25 = sqrt(sqrt(p)), p^0.75 = their product — so every power
    * is IEEE-exact sqrt/multiply in BOTH engines; no libm pow() is in
    * the compared path. Weights are 10dp-rounded decimals before the
    * normalizing sum (the #74 discipline).
    *
    * Scale shape: one |lang × source|-key token count; the sweep is a
    * 4-way map-side fan-out of the model-sized share table with
    * decimal window sums per τ. */
  def corpusMixTemperature(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(col("lang"), col("source"),
              size(graft.functions.TextFunctions.tokens(col("text")))
                .cast("long").as("n_tok"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
    val wAll = Window.partitionBy()
    val share = col("n_tokens").cast("double") /
      sum(col("n_tokens")).over(wAll).cast("double")
    val shared = g.withColumn("share", r(share, 6))
      .withColumn("p", share)
    val taus = Seq(
      ("1.00", col("p")),
      ("0.75", sqrt(col("p")) * sqrt(sqrt(col("p")))),
      ("0.50", sqrt(col("p"))),
      ("0.25", sqrt(sqrt(col("p")))))
    val melted = taus.map { case (t, e) =>
      shared.select(col("lang"), col("source"), col("n_tokens"), col("share"),
                    lit(t).as("tau"), r(e, 10).cast("decimal(18,10)").as("w10"))
    }.reduce(_ unionByName _)
    val wTau = Window.partitionBy(col("tau"))
    melted
      .withColumn("weight",
        r(col("w10").cast("double") / sum(col("w10")).over(wTau).cast("double"), 6))
      .withColumn("epochs",
        when(col("share") > 0, r(col("weight") / col("share"), 6)))
      .select(col("tau"), col("lang"), col("source"), col("n_tokens"),
              col("share"), col("weight"), col("epochs"))
      .orderBy(col("tau"), col("lang"), col("source"))
  }

  val corpusMixTemperatureSql: String = {
    val taus = Seq(
      ("1.00", "p"), ("0.75", "sqrt(p) * sqrt(sqrt(p))"),
      ("0.50", "sqrt(p)"), ("0.25", "sqrt(sqrt(p))"))
    val melt = taus.map { case (t, e) =>
      s"SELECT lang, source, n_tokens, share, '$t' AS tau, CAST(${sqlR(e, 10)} AS DECIMAL(18,10)) AS w10 FROM sh"
    }.mkString("\nUNION ALL\n")
    s"""WITH g AS (
       |  SELECT lang, source,
       |         CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1, 2),
       |sh AS (
       |  SELECT lang, source, n_tokens,
       |         ${sqlR("CAST(n_tokens AS DOUBLE) / CAST(CAST(sum(n_tokens) OVER () AS BIGINT) AS DOUBLE)", 6)} AS share,
       |         CAST(n_tokens AS DOUBLE) /
       |           CAST(CAST(sum(n_tokens) OVER () AS BIGINT) AS DOUBLE) AS p
       |  FROM g),
       |melted AS (
       |$melt
       |)
       |SELECT tau, lang, source, n_tokens, share,
       |       ${sqlR("CAST(w10 AS DOUBLE) / CAST(sum(w10) OVER (PARTITION BY tau) AS DOUBLE)", 6)} AS weight,
       |       CASE WHEN share > 0
       |            THEN ${sqlR(s"(${sqlR("CAST(w10 AS DOUBLE) / CAST(sum(w10) OVER (PARTITION BY tau) AS DOUBLE)", 6)}) / share", 6)}
       |       END AS epochs
       |FROM melted ORDER BY tau, lang, source""".stripMargin
  }

  // ------------------------------------- #186 events_fraud_velocity

  private[graft] val VelocityWindowUs = 3600000000L
  private[graft] val VelocityFlagAt = 20L

  /** #186 events_fraud_velocity: per-user VELOCITY check — the maximum
    * number of events (and of conversions) the user packed into any
    * sliding one-hour window, flagged past a rate threshold. The
    * rate-limit screen an abuse pipeline runs NEXT TO #145's
    * shape-based bot score: #145 catches machine-regular cadence, this
    * catches bursts regardless of regularity (card testing, scraping
    * sprints, giveaway sniping).
    *
    * Scale shape: one per-user RANGE window over event-time micros
    * (frame = the trailing hour — bounded by events-per-user, the #53
    * contract; integer endpoints so both engines cut identical
    * frames), then a per-user max rollup sharing the same exchange. */
  def eventsFraudVelocity(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-(VelocityWindowUs - 1), Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), epochUs(col("ts")).as("us"),
              (col("event_type") === Round6Ops3.ConvType).cast("long").as("cv"))
      .withColumn("ev_1h", count(lit(1)).over(w))
      .withColumn("cv_1h", sum(col("cv")).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           max(col("ev_1h")).as("max_events_1h"),
           max(col("cv_1h")).as("max_conv_1h"))
      .withColumn("velocity_flag", col("max_events_1h") >= VelocityFlagAt)
      .orderBy(col("user_id"))
  }

  val eventsFraudVelocitySql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |         CASE WHEN event_type = '${Round6Ops3.ConvType}'
       |              THEN 1 ELSE 0 END AS cv
       |  FROM events),
       |win AS (
       |  SELECT user_id,
       |         count(*) OVER w AS ev_1h, sum(cv) OVER w AS cv_1h
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us
       |               RANGE BETWEEN ${VelocityWindowUs - 1} PRECEDING
       |                         AND CURRENT ROW))
       |SELECT user_id, count(*) AS n_events,
       |       CAST(max(ev_1h) AS BIGINT) AS max_events_1h,
       |       CAST(max(cv_1h) AS BIGINT) AS max_conv_1h,
       |       max(ev_1h) >= $VelocityFlagAt AS velocity_flag
       |FROM win GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------- #187 events_dormancy_reactivation

  private[graft] val DormancyHours = Seq(24L, 48L, 72L)

  /** #187 events_dormancy_reactivation: the WIN-BACK accounting — every
    * gap of more than 24 hours between a user's consecutive events is a
    * dormancy that ENDED (the user came back), bucketed by how long
    * they were gone (25-48h, 49-72h, 73h+), with per-bucket dormancy
    * counts, distinct users, and mean gap length. The realized-return
    * complement of #152's survival curve (KM says how LIKELY a return
    * is at each duration; this counts the returns that actually
    * happened and how deep the sleep was) — the table a lifecycle team
    * sizes re-engagement campaigns with.
    *
    * Scale shape: one per-user lag window (events-per-user bounded),
    * map-only gap bucketing, a ≤3-row rollup with decimal-exact means.
    */
  def eventsDormancyReactivation(s: SparkSession, dir: String): DataFrame = {
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("us"))
      .withColumn("gap_hours",
        expr("(us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)) div 3600000000"))
      .filter(col("gap_hours") > DormancyHours.head)
    val bucket = when(col("gap_hours") <= DormancyHours(1), lit("a_25_48h"))
      .when(col("gap_hours") <= DormancyHours(2), lit("b_49_72h"))
      .otherwise(lit("c_73h_plus"))
    gaps.select(col("user_id"), col("gap_hours"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_dormancies"),
           countDistinct(col("user_id")).as("n_users"),
           davg(col("gap_hours").cast("double"), 6).as("mean_gap_hours"))
      .orderBy(col("bucket"))
  }

  val eventsDormancyReactivationSql: String =
    s"""WITH gaps AS (
       |  SELECT user_id,
       |         (epoch_us(CAST(ts AS TIMESTAMP)) -
       |          lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
       |            (PARTITION BY user_id
       |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id))
       |           // 3600000000 AS gap_hours
       |  FROM events),
       |d AS (
       |  SELECT user_id, gap_hours,
       |         CASE WHEN gap_hours <= ${DormancyHours(1)} THEN 'a_25_48h'
       |              WHEN gap_hours <= ${DormancyHours(2)} THEN 'b_49_72h'
       |              ELSE 'c_73h_plus' END AS bucket
       |  FROM gaps WHERE gap_hours > ${DormancyHours.head})
       |SELECT bucket, count(*) AS n_dormancies,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |       ${sqlAvg("CAST(gap_hours AS DOUBLE)", 6)} AS mean_gap_hours
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
}
