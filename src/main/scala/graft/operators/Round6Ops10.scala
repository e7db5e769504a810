package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-27 operators (SURVEY §2 #212, #214, #216): the AMS
  * second-frequency-moment sketch, the deterministic bottom-k uniform
  * sample, and k-core decomposition by h-index iteration. The streaming
  * counterparts (#213 stream_ams_f2, #215 stream_sample) live in
  * [[graft.streaming.Streaming]] and drain the SAME register builders.
  */
object Round6Ops10 {

  // ------------------------------------------------------ #212 events_ams_f2

  /** Independent sign rows the AMS estimates average over. */
  val AmsRows = 8

  /** The portable ±1 four-wise-style hash: row-seeded md5 parity. */
  private def amsSign: Column =
    when(substring(md5(concat(col("r").cast("string"), lit(":"),
                              col("user_id").cast("string")).cast("binary")),
                   32, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L)
      .otherwise(-1L)

  /** The mergeable register table: per (event_type, sign row), the
    * running signed sum Z_r = Σ_u s_r(u)·f_u — accumulated directly
    * over events (each event adds its user's sign), so `sum` is the
    * merge operator and the SAME aggregate is the streaming state in
    * [[graft.streaming.Streaming.streamAmsF2]]. */
  def amsRegisters(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), col("user_id"),
              explode(sequence(lit(0), lit(AmsRows - 1))).as("r"))
      .select(col("event_type"), col("r"), amsSign.as("s"))
      .groupBy(col("event_type"), col("r"))
      .agg(sum(col("s")).as("z"))

  /** Estimate + exact readout over the ≤ types×[[AmsRows]] register
    * table: E[Z²] = F₂ per sign row, averaged across rows. */
  def amsFinalize(regs: DataFrame, ev: DataFrame): DataFrame = {
    val exact = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("event_type"))
      .agg(sum(col("f") * col("f")).as("f2_exact"))
    val wType = Window.partitionBy(col("event_type"))
    regs
      .withColumn("est", col("z") * col("z"))
      .withColumn("f2_est",
        r(sum(col("est")).over(wType) / lit(AmsRows.toDouble), 2))
      .join(graft.Hints.keyDim(exact), Seq("event_type"))
      .withColumn("rel_err",
        r(abs(col("f2_est") - col("f2_exact")) / col("f2_exact"), 6))
      .select(col("event_type"), col("r"), col("z"), col("est"),
              col("f2_est"), col("f2_exact"), col("rel_err"))
      .orderBy(col("event_type"), col("r"))
  }

  /** #212 events_ams_f2: the Alon–Matthias–Szegedy F₂ sketch — the
    * second frequency moment Σ f_u² of each type's user-frequency
    * vector estimated from [[AmsRows]] signed counters Z_r = Σ s_r(u)f_u
    * (E[Z²] = F₂), with the exact F₂ and relative error beside it. F₂
    * is the self-join size / skew gauge: it prices #58's salting
    * decision and ranks types by concentration where #54's HLL counts
    * distinct support. The sketch is O(rows) integers per type,
    * mergeable by plain addition — each event contributes its user's
    * sign, so partials combine map-side and the identical aggregate is
    * the streaming state (#213).
    *
    * Scale shape: one ×[[AmsRows]] fan-out scan → one groupBy to
    * type×row registers; the exact column (test-SF verification,
    * droppable at scale) is a two-level aggregation; estimates are
    * integer-exact algebra on the register table. */
  def eventsAmsF2(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    amsFinalize(amsRegisters(ev), ev)
  }

  val eventsAmsF2Sql: String =
    s"""WITH fan AS (
       |  SELECT event_type, user_id, r.r AS r
       |  FROM events, range(0, $AmsRows) r(r)),
       |regs AS (
       |  SELECT event_type, r,
       |         CAST(sum(CASE WHEN substr(md5(CAST(r AS VARCHAR) || ':' ||
       |                           CAST(user_id AS VARCHAR)), 32, 1)
       |                  IN ('0','1','2','3','4','5','6','7')
       |                  THEN 1 ELSE -1 END) AS BIGINT) AS z
       |  FROM fan GROUP BY 1, 2),
       |exact AS (
       |  SELECT event_type, CAST(sum(f * f) AS BIGINT) AS f2_exact FROM (
       |    SELECT event_type, user_id, count(*) AS f
       |    FROM events GROUP BY 1, 2)
       |  GROUP BY 1),
       |est AS (
       |  SELECT event_type, r, z, z * z AS est,
       |         ${sqlR(s"CAST(sum(z * z) OVER (PARTITION BY event_type) AS DOUBLE) / $AmsRows.0", 2)}
       |           AS f2_est
       |  FROM regs)
       |SELECT event_type, r, z, est, f2_est, f2_exact,
       |       ${sqlR("abs(f2_est - f2_exact) / f2_exact", 6)} AS rel_err
       |FROM est JOIN exact USING (event_type)
       |ORDER BY event_type, r""".stripMargin

  // --------------------------------------------- #214 events_bottomk_sample

  /** Sample size per type. */
  val SampleK = 32

  /** The portable 60-bit event hash the sample orders by. */
  private def sampleHash: Column =
    conv(substring(md5(col("event_id").cast("string").cast("binary")), 1, 15),
         16, 10).cast("long")

  /** The mergeable sample state: per type, the k records with the
    * smallest (hash, event_id) — CollectTopK min-heaps, so partials
    * merge and the SAME aggregate is the streaming state in
    * [[graft.streaming.Streaming.streamSample]]. */
  def sampleSketch(ev: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensure(ev.sparkSession)
    ev.select(col("event_type"),
              struct(sampleHash.as("h"), col("event_id"),
                     col("user_id")).as("rec"))
      .groupBy(col("event_type"))
      .agg(array_sort(call_function("collect_top_k", col("rec"),
                                    lit(SampleK), lit(true))).as("recs"))
  }

  /** Long-format readout of the drained sample arrays. */
  def sampleFinalize(sk: DataFrame): DataFrame =
    sk.select(col("event_type"), posexplode(col("recs")).as(Seq("p", "rec")))
      .select(col("event_type"), (col("p") + 1).cast("long").as("rank"),
              col("rec.h").as("h"), col("rec.event_id"), col("rec.user_id"))
      .orderBy(col("event_type"), col("rank"))

  /** #214 events_bottomk_sample: deterministic UNIFORM SAMPLE per type —
    * the k records whose md5 event-hash is smallest. Bottom-k by a
    * fixed hash IS a uniform sample without replacement, and unlike
    * `TABLESAMPLE`/`randomSplit` it is partition-layout-independent,
    * replayable (the same event keeps its ticket forever — audits can
    * re-pull the identical sample months later), and MERGEABLE: min-k
    * heaps combine across partials, micro-batches (#215) and data
    * growth (a new event displaces the largest ticket only if it wins).
    * The inspection sample every feed monitor wants beside #40's
    * stratified rates.
    *
    * Scale shape: map-only hash + one groupBy into O(k) state per type
    * (CollectTopK min-heaps — never a sort of the corpus); readout
    * explodes ≤ types×k rows. */
  def eventsBottomkSample(s: SparkSession, dir: String): DataFrame =
    sampleFinalize(sampleSketch(Tables.events(s, dir)))

  val eventsBottomkSampleSql: String =
    s"""WITH h AS (
       |  SELECT event_type,
       |         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h,
       |         event_id, user_id
       |  FROM events),
       |r AS (
       |  SELECT event_type, h, event_id, user_id,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY h, event_id) AS rank
       |  FROM h)
       |SELECT event_type, rank, h, event_id, user_id
       |FROM r WHERE rank <= $SampleK
       |ORDER BY event_type, rank""".stripMargin

  // --------------------------------------------------------- #216 graph_kcore

  /** h-index iterations (fixed, like #80's power iterations; the spec
    * pins convergence within this budget at test SF). */
  val KcoreRounds = 8

  /** The undirected brand co-purchase edge list (both directions), the
    * #80/#80b derivation. */
  private[graft] def brandEdges(s: SparkSession, dir: String): DataFrame =
    // the memoized weighted pair table's key set (distinct by its
    // groupBy construction) — shared with #80/#80b/#66
    Graph.brandPairsW(s, dir).select(col("src"), col("dst"))

  /** #216 graph_kcore: CORE DECOMPOSITION of the brand co-purchase
    * graph by h-index iteration (Lü et al. 2016): h₀ = degree,
    * h_{t+1}(v) = H-index of v's neighbors' h_t; the fixpoint is
    * exactly the coreness. Coreness is the engagement-tier / robustness
    * readout the flat degree misses (#80 ranks influence, #80b measures
    * closure; the 2-core strips hangers-on, the max core is the
    * resilient nucleus) — and the standard peel ("repeatedly delete
    * min-degree nodes") is inherently sequential, while h-index
    * iteration is embarrassingly parallel rounds of the SAME
    * neighbor-join shape as #80.
    *
    * Scale shape: [[KcoreRounds]] fixed rounds (deterministic output —
    * the #80 contract), each one edge⋈h join + a per-node window
    * bounded by degree; everything integer-exact, nothing collected.
    * On a power-law graph the per-node H-index would move to a
    * (node, h-value) count-histogram aggregation instead of the
    * row_number window — same rounds, no celebrity-degree window. */
  def graphKcore(s: SparkSession, dir: String): DataFrame =
    graphKcoreDf(brandEdges(s, dir), KcoreRounds)

  /** DataFrame-generic core: expects symmetric distinct (src, dst). */
  def graphKcoreDf(edges0: DataFrame, rounds: Int = KcoreRounds): DataFrame = {
    val edges = edges0.transform(graft.Lineage.cut)
    val degree = edges.groupBy(col("src")).agg(count(lit(1)).as("h"))
    var h = degree.transform(graft.Lineage.cut)
    val wNb = Window.partitionBy(col("src"))
      .orderBy(col("h_nb").desc, col("dst"))
    for (_ <- 1 to rounds) {
      h = edges
        .join(h.select(col("src").as("dst"), col("h").as("h_nb")), Seq("dst"))
        .withColumn("rn", row_number().over(wNb))
        .groupBy(col("src"))
        .agg(max(least(col("rn").cast("long"), col("h_nb"))).as("h"))
        .transform(graft.Lineage.cut)
    }
    degree.withColumnRenamed("h", "degree").join(h, Seq("src"))
      .select(col("src").as("brand"), col("degree"), col("h").as("coreness"))
      .orderBy(col("coreness").desc, col("brand"))
  }

  def graphKcoreSql(rounds: Int = KcoreRounds): String = {
    def round(prev: String, out: String) =
      s"""$out AS (
         |  SELECT src, CAST(max(least(rn, h_nb)) AS BIGINT) AS h FROM (
         |    SELECT e.src, e.dst, p.h AS h_nb,
         |           row_number() OVER (PARTITION BY e.src
         |                              ORDER BY p.h DESC, e.dst) AS rn
         |    FROM edges e JOIN $prev p ON p.src = e.dst)
         |  GROUP BY 1)"""
    val chain = (1 to rounds).map(i => round(s"h${i - 1}", s"h$i")).mkString(",\n")
    s"""WITH ob AS (
       |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |edges AS (
       |  SELECT DISTINCT a.brand AS src, b.brand AS dst
       |  FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand <> b.brand),
       |h0 AS (SELECT src, count(*) AS h FROM edges GROUP BY 1),
       |$chain
       |SELECT d.src AS brand, CAST(d.h AS BIGINT) AS degree,
       |       f.h AS coreness
       |FROM h0 d JOIN h$rounds f USING (src)
       |ORDER BY coreness DESC, brand""".stripMargin
  }
}
