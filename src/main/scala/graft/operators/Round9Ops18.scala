package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-18 operator (SURVEY §2 #343): pairwise source style
  * divergence. (#342 `stream_robust_center` lives in
  * [[graft.streaming.Streaming.streamRobustCenter]] over the #337
  * registers.)
  */
object Round9Ops18 {

  // ------------------------------------- #343 doc_style_divergence

  /** #343 doc_style_divergence: JENSEN-SHANNON divergence between
    * every source pair's CHARACTER distribution — the corpus-
    * homogeneity audit behind mixing decisions: two sources whose
    * character statistics barely diverge are stylistic near-twins
    * (upweighting both buys less diversity than the token counts
    * suggest), while a source that diverges from everything is either
    * a different language/script or junk (#258 tells which). JS, not
    * KL: symmetric, and finite without smoothing because the mixture
    * M = (P+Q)/2 is positive wherever either side is. Reported in
    * nats and normalized to [0, 1] by ln 2, with the single most
    * divergent character per pair (the debugging handle — it is
    * usually whitespace, a script marker, or a markup character).
    *
    * Scale shape: the corpus is touched once in a (source, char)
    * count rollup (map-side combinable, alphabet-bounded); the share
    * table, the pair × alphabet dense grid, the JS fold and the
    * top-char pick are all MODEL-SIZED (|sources|² × |alphabet|). */
  def docStyleDivergence(s: SparkSession, dir: String): DataFrame =
    styleDivergenceDf(Tables.documents(s, dir))

  /** DataFrame-generic core: expects (source, text). */
  def styleDivergenceDf(docs: DataFrame): DataFrame =
    styleFinalize(charCountRegisters(docs))

  /** The (source, char) count registers — count merges by addition
    * and the register table is alphabet-bounded, so this IS the #346
    * streaming state. */
  private[graft] def charCountRegisters(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(split(lower(col("text")), "")).as("ch"))
      .groupBy(col("source"), col("ch")).agg(count(lit(1)).as("c"))

  /** JS readout over the drained register table — shared verbatim by
    * batch and the #346 stream twin (pinned: it feeds totals, shares,
    * the grid spine and both join sides). */
  private[graft] def styleFinalize(cntIn: DataFrame): DataFrame = {
    val cnt = graft.Lineage.pin(cntIn)
    val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val sh = cnt.join(tot, "source")
      .select(col("source"), col("ch"),
              (col("c") / col("n")).as("p"))
      .transform(graft.Lineage.pin)
    val srcs = sh.select(col("source")).distinct()
    val grid = srcs.select(col("source").as("source_a"))
      .crossJoin(broadcast(srcs.select(col("source").as("source_b"))))
      .filter(col("source_a") < col("source_b"))
      .crossJoin(broadcast(sh.select(col("ch")).distinct()))
    val j = grid
      .join(broadcast(sh.select(col("source").as("source_a"), col("ch"),
        col("p").as("pa"))), Seq("source_a", "ch"), "left")
      .join(broadcast(sh.select(col("source").as("source_b"), col("ch"),
        col("p").as("pb"))), Seq("source_b", "ch"), "left")
      .withColumn("pa", coalesce(col("pa"), lit(0d)))
      .withColumn("pb", coalesce(col("pb"), lit(0d)))
      .withColumn("m", (col("pa") + col("pb")) / 2)
      .withColumn("ta", when(col("pa") > 0,
        col("pa") * r(log(col("pa") / col("m")), 6)).otherwise(lit(0d)))
      .withColumn("tb", when(col("pb") > 0,
        col("pb") * r(log(col("pb") / col("m")), 6)).otherwise(lit(0d)))
      .withColumn("contrib", r((col("ta") + col("tb")) / 2, 6))
    j.groupBy(col("source_a"), col("source_b"))
      .agg(dsum(col("contrib"), 6).as("js_nats"),
           max(struct(col("contrib"), col("ch"))).as("top"))
      .withColumn("js_norm", r(col("js_nats") / r(log(lit(2.0)), 6), 6))
      .select(col("source_a"), col("source_b"), col("js_nats"),
              col("js_norm"), col("top.ch").as("top_char"),
              col("top.contrib").as("top_contrib"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val docStyleDivergenceSql: String =
    s"""WITH cnt AS (
       |  SELECT source, ch, count(*) AS c FROM (
       |    SELECT source, unnest(string_split(lower(text), '')) AS ch
       |    FROM documents)
       |  GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
       |sh AS (
       |  SELECT c.source, c.ch, c.c / t.n AS p
       |  FROM cnt c JOIN tot t USING (source)),
       |srcs AS (SELECT DISTINCT source FROM sh),
       |grid AS (
       |  SELECT a.source AS source_a, b.source AS source_b, g.ch
       |  FROM srcs a JOIN srcs b ON a.source < b.source
       |  CROSS JOIN (SELECT DISTINCT ch FROM sh) g),
       |j AS (
       |  SELECT g.source_a, g.source_b, g.ch,
       |         COALESCE(sa.p, 0.0) AS pa, COALESCE(sb.p, 0.0) AS pb
       |  FROM grid g
       |  LEFT JOIN sh sa ON sa.source = g.source_a AND sa.ch = g.ch
       |  LEFT JOIN sh sb ON sb.source = g.source_b AND sb.ch = g.ch),
       |terms AS (
       |  SELECT source_a, source_b, ch,
       |         ${sqlR(
             s"""(CASE WHEN pa > 0
                  THEN pa * (${sqlR("ln(pa / ((pa + pb) / 2))", 6)})
                  ELSE 0.0 END +
                  CASE WHEN pb > 0
                  THEN pb * (${sqlR("ln(pb / ((pa + pb) / 2))", 6)})
                  ELSE 0.0 END) / 2""", 6)} AS contrib
       |  FROM j),
       |agg AS (
       |  SELECT source_a, source_b,
       |         ${sqlSum("contrib", 6)} AS js_nats
       |  FROM terms GROUP BY 1, 2),
       |top AS (
       |  SELECT source_a, source_b, ch AS top_char, contrib AS top_contrib
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY source_a, source_b
       |      ORDER BY contrib DESC, ch DESC) AS rn
       |    FROM terms)
       |  WHERE rn = 1)
       |SELECT a.source_a, a.source_b, a.js_nats,
       |       ${sqlR(s"a.js_nats / (${sqlR("ln(2.0)", 6)})", 6)} AS js_norm,
       |       t.top_char, t.top_contrib
       |FROM agg a JOIN top t USING (source_a, source_b)
       |ORDER BY a.source_a, a.source_b""".stripMargin
}
