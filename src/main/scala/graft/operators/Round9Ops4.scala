package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-9 batch-4 operators (SURVEY §2 #310-#313): PSI drift
  * scorecard, modularity of the similarity-graph communities, and LPA
  * communities over the near-dup pair graph. (#311's stream twin lives
  * in [[graft.streaming.Streaming.streamDiffInDiff]] over the #304
  * registers.)
  */
object Round9Ops4 {

  // ----------------------------------------------- #310 dq_value_psi

  /** #310 dq_value_psi: POPULATION STABILITY INDEX per event type —
    * the industry-standard scorecard drift metric (Σ (q−p)·ln(q/p)
    * over a fixed binning) between the feed's first and second half:
    * where #219's KS reports a TEST statistic (max CDF gap, is there
    * ANY shift), PSI reports shift MAGNITUDE on the bands model-risk
    * teams actually gate on (<0.1 stable, <0.25 moderate, else major).
    * Bins are the #116 fixed value-range grid (shared ksBin — no
    * quantile pass); shares are Laplace-smoothed ((c+1)/(n+B), the
    * deterministic guard that keeps empty bins out of ln 0 in BOTH
    * engines identically).
    *
    * Scale shape: identical to #219 — one binned rollup
    * (map-side-combinable) against a broadcast 1-row bounds scalar,
    * the dense types × 64 grid, per-(type, half) window sums over 64
    * rows per key, a bin-keyed self-pair and a ≤|types| rollup. ln
    * 6dp-rounds before the decimal sum (the #125 discipline). */
  def dqValuePsi(s: SparkSession, dir: String): DataFrame =
    dqValuePsiDf(Tables.events(s, dir))

  /** DataFrame-generic core: expects (event_type, ts, value). */
  def dqValuePsiDf(ev: DataFrame): DataFrame = {
    val dated = ev.withColumn("d", to_date(col("ts")))
    val bounds = dated.agg(
      min(col("d")).as("dmin"), max(col("d")).as("dmax"),
      min(col("value")).as("lo"), max(col("value")).as("hi"))
      .withColumn("mid", date_add(col("dmin"),
        (datediff(col("dmax"), col("dmin")) / 2).cast("int")))
    psiFinalize(psiRegisterCounts(dated.crossJoin(broadcast(bounds))))
  }

  /** The (type, half, bin) count rollup over a frame that already
    * carries `d`, `mid`, `lo`, `hi` columns — broadcast-joined in the
    * batch build, literal columns in the #316 stream (the #284
    * exported-scalar discipline). Counts merge by addition: this IS
    * the streaming state, ≤ types × 2 × 64 registers. */
  private[graft] def psiRegisterCounts(withBounds: DataFrame): DataFrame =
    withBounds
      .withColumn("half", when(col("d") <= col("mid"), 1).otherwise(2))
      .withColumn("bin", Round6Ops.ksBin)
      .groupBy(col("event_type"), col("half"), col("bin"))
      .agg(count(lit(1)).as("c"))

  /** PSI readout over the drained register table: dense-grid fill,
    * Laplace-smoothed shares, the (q−p)·ln(q/p) sum and verdict. The
    * register table is pinned first: it is consumed on BOTH sides of
    * the grid left-join, and a streaming memory-sink view cannot
    * self-join (no MultiInstanceRelation — Catalyst's conflicting-
    * references error); the pin also keeps the batch build from
    * computing the rollup twice. */
  private[graft] def psiFinalize(binnedIn: DataFrame): DataFrame = {
    import Round6Ops.KsBins
    val binned = graft.Lineage.pin(binnedIn)
    val grid = binned.select(col("event_type")).distinct()
      .crossJoin(binned.sparkSession.range(2)
        .select((col("id") + 1).cast("int").as("half")))
      .crossJoin(binned.sparkSession.range(KsBins)
        .select(col("id").cast("int").as("bin")))
    val wTot = Window.partitionBy(col("event_type"), col("half"))
    val sh = grid.join(binned, Seq("event_type", "half", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("n", sum(col("c")).over(wTot))
      .withColumn("p", (col("c") + 1).cast("double") /
                       (col("n") + KsBins).cast("double"))
    val pre = sh.filter(col("half") === 1)
      .select(col("event_type"), col("bin"), col("p").as("p1"), col("n").as("n1"))
    val post = sh.filter(col("half") === 2)
      .select(col("event_type"), col("bin"), col("p").as("p2"), col("n").as("n2"))
    pre.join(post, Seq("event_type", "bin"))
      .groupBy(col("event_type"))
      .agg(max(col("n1")).as("n_pre"), max(col("n2")).as("n_post"),
           dsum((col("p2") - col("p1")) * r(log(col("p2") / col("p1")), 6), 6)
             .as("psi"))
      .withColumn("verdict",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("major"))
      .orderBy(col("event_type"))
  }

  /** The feed's (mid, lo, hi) scalars collected batch-side — the
    * binning contract a PSI stream ships (a stream cannot re-aggregate
    * its own range; the #284 exported-scalar discipline). */
  private[graft] def psiBounds(ev: DataFrame): (java.sql.Date, Double, Double) = {
    val row = ev.withColumn("d", to_date(col("ts")))
      .agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"),
           min(col("value")).as("lo"), max(col("value")).as("hi"))
      .withColumn("mid", date_add(col("dmin"),
        (datediff(col("dmax"), col("dmin")) / 2).cast("int")))
      .collect()(0)
    (row.getAs[java.sql.Date]("mid"), row.getAs[Double]("lo"),
     row.getAs[Double]("hi"))
  }

  /** #316's registers: the shared rollup under literal bounds. */
  private[graft] def psiRegistersLit(ev: DataFrame, mid: java.sql.Date,
                                     lo: Double, hi: Double): DataFrame =
    psiRegisterCounts(ev
      .withColumn("d", to_date(col("ts")))
      .withColumn("mid", lit(mid))
      .withColumn("lo", lit(lo))
      .withColumn("hi", lit(hi)))

  val dqValuePsiSql: String = {
    import Round6Ops.KsBins
    val term = s"(b.p - a.p) * (${sqlR("ln(b.p / a.p)", 6)})"
    s"""WITH dated AS (
       |  SELECT event_type, value, CAST(ts AS DATE) AS d FROM events),
       |bounds AS (
       |  SELECT min(d) + CAST(datediff('day', min(d), max(d)) // 2 AS INT) AS mid,
       |         min(value) AS lo, max(value) AS hi
       |  FROM dated),
       |binned AS (
       |  SELECT event_type,
       |         CASE WHEN d <= b.mid THEN 1 ELSE 2 END AS half,
       |         CASE WHEN b.hi = b.lo THEN 0
       |              ELSE LEAST(${KsBins - 1},
       |                CAST(floor(((value - b.lo) / (b.hi - b.lo)) * $KsBins)
       |                     AS INT))
       |         END AS bin,
       |         count(*) AS c
       |  FROM dated CROSS JOIN bounds b GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT t.event_type, h.half, g.bin
       |  FROM (SELECT DISTINCT event_type FROM binned) t
       |  CROSS JOIN (SELECT CAST(range + 1 AS INT) AS half FROM range(0, 2)) h
       |  CROSS JOIN (SELECT CAST(range AS INT) AS bin FROM range(0, $KsBins)) g),
       |sh AS (
       |  SELECT g.event_type, g.half, g.bin,
       |         CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
       |         CAST(sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.event_type, g.half)
       |              + $KsBins AS DOUBLE) AS p,
       |         CAST(sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.event_type, g.half)
       |              AS BIGINT) AS n
       |  FROM grid g LEFT JOIN binned c
       |    ON g.event_type = c.event_type AND g.half = c.half AND g.bin = c.bin),
       |j AS (
       |  SELECT a.event_type, max(a.n) AS n_pre, max(b.n) AS n_post,
       |         ${sqlSum(term, 6)} AS psi
       |  FROM sh a JOIN sh b
       |    ON a.event_type = b.event_type AND a.bin = b.bin
       |   AND a.half = 1 AND b.half = 2
       |  GROUP BY 1)
       |SELECT event_type, n_pre, n_post, psi,
       |       CASE WHEN psi < 0.1 THEN 'stable'
       |            WHEN psi < 0.25 THEN 'moderate'
       |            ELSE 'major' END AS verdict
       |FROM j ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------- #313 graph_modularity

  /** #313 graph_modularity: Newman MODULARITY of the #302 LPA
    * partition over the kNN similarity graph — per community c:
    * Q_c = m_c/m − (d_c/2m)², Q = Σ Q_c. The quantitative verdict on
    * #302's output (Q near 0 = the "communities" are no better than a
    * random cut of the degree sequence; the readout that decides
    * whether cluster-blocked curation can trust the partition at all).
    * Per-community rows carry member count, intra-edge count, degree
    * sum, the contribution, and the corpus Q.
    *
    * Scale shape: the arc table joins the label table on each endpoint
    * (two key-proportional shuffles), then a ≤|communities| rollup; the
    * arc total is a broadcast 1-row scalar, Q a decimal sum over the
    * bounded community table. Everything integer until the final
    * divisions; contributions 6dp-round before the decimal sum. */
  def graphModularity(s: SparkSession, dir: String, k: Int = 3,
                      iters: Int = 4): DataFrame =
    // rides the memoized symmetric edge set + converged LPA label
    // table shared with #302/#347 (identical partition by contract)
    modularityCore(Round9Ops2.knnUndCached(s, dir, k),
                   Round9Ops2.lpaLabelsCached(s, dir, k, iters))

  /** DataFrame-generic core: directed (src, dst) edges, symmetrized
    * internally; partitions with the #302 LPA at the same rounds. */
  def modularityDf(e: DataFrame, iters: Int): DataFrame = {
    val und = e.union(e.select(col("dst"), col("src")))
      .distinct().transform(graft.Lineage.pin)
    val lab = Round9Ops2.lpaRaw(und, iters)
      .transform(graft.Lineage.cut)
    modularityCore(und, lab)
  }

  /** The modularity readout over an already-symmetrized edge table and
    * its (id, community) label table. */
  private def modularityCore(und: DataFrame, lab: DataFrame): DataFrame = {
    val withLab = und
      .join(lab.select(col("id").as("src"), col("community").as("ca")), "src")
      .join(lab.select(col("id").as("dst"), col("community").as("cb")), "dst")
    val perC = withLab.groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("deg_sum"),
           sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("intra_arcs"))
    val nNodes = lab.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
    val tot = und.agg(count(lit(1)).cast("double").as("arcs"))
    val contrib = perC.join(nNodes, "community").crossJoin(broadcast(tot))
      .withColumn("q_contrib",
        r(col("intra_arcs") / col("arcs") -
          (col("deg_sum") / col("arcs")) * (col("deg_sum") / col("arcs")), 6))
    val q = contrib.agg(dsum(col("q_contrib"), 6).as("modularity"))
    contrib.crossJoin(broadcast(q))
      .select(col("community"), col("n_nodes"),
              (col("intra_arcs") / 2).cast("long").as("m_intra"),
              col("deg_sum"), col("q_contrib"), col("modularity"))
      .orderBy(col("community"))
  }

  def graphModularitySql(k: Int = 3, iters: Int = 4): String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT id, community FROM (
         |    SELECT u.dst AS id, p.community, count(*) AS votes,
         |           row_number() OVER (PARTITION BY u.dst
         |             ORDER BY count(*) DESC, p.community) AS rn
         |    FROM und u JOIN $prev p ON p.id = u.src
         |    GROUP BY u.dst, p.community)
         |  WHERE rn = 1)"""
    val rounds = (1 to iters).map(i => round(s"l${i - 1}", s"l$i")).mkString(",\n")
    s"""WITH g AS (SELECT q_id, vec_id FROM (${Similarity.knnGraphSql(k)})),
       |und AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT q_id AS src, vec_id AS dst FROM g
       |    UNION ALL
       |    SELECT vec_id AS src, q_id AS dst FROM g)),
       |l0 AS (SELECT DISTINCT src AS id, src AS community FROM und),
       |$rounds,
       |wl AS (
       |  SELECT a.community AS ca, b.community AS cb
       |  FROM und u
       |  JOIN l$iters a ON a.id = u.src
       |  JOIN l$iters b ON b.id = u.dst),
       |perc AS (
       |  SELECT ca AS community, count(*) AS deg_sum,
       |         CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS intra_arcs
       |  FROM wl GROUP BY 1),
       |nn AS (SELECT community, count(*) AS n_nodes FROM l$iters GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS arcs FROM und),
       |contrib AS (
       |  SELECT p.community, n.n_nodes, p.intra_arcs, p.deg_sum,
       |         ${sqlR("p.intra_arcs / t.arcs - (p.deg_sum / t.arcs) * (p.deg_sum / t.arcs)", 6)} AS q_contrib
       |  FROM perc p JOIN nn n USING (community) CROSS JOIN tot t),
       |q AS (SELECT ${sqlSum("q_contrib", 6)} AS modularity FROM contrib)
       |SELECT community, n_nodes,
       |       CAST(intra_arcs / 2 AS BIGINT) AS m_intra,
       |       deg_sum, q_contrib, modularity
       |FROM contrib CROSS JOIN q
       |ORDER BY community""".stripMargin
  }

  // ------------------------------------- #312 dedup_lpa_communities

  /** #312 dedup_lpa_communities: majority-vote LPA over the #26
    * n-gram-Jaccard NEAR-DUP pair graph — the density-granular
    * companion to #42's connected components on the SAME edge set: a
    * boilerplate chain that CC coalesces into one mega-cluster splits
    * at its bridge docs, so keep-one-per-group deletes per dense core
    * instead of per chained blob (exactly the over-merge failure #148's
    * size histogram warns about). Labels propagate only within a
    * component, so every LPA community is PROVABLY a refinement of its
    * #42 cluster (spec-pinned). Isolated docs keep their own id —
    * singleton communities, mirroring #42's contract.
    *
    * Scale shape: rides the #26 banded pair table; the fixed-round LPA
    * is #302's (per round: one edges⋈labels join + a degree-bounded
    * rank-1 window); the isolate fill is one left join off the doc
    * table. */
  def dedupLpaCommunities(s: SparkSession, dir: String, tau: Double = 0.3,
                          iters: Int = 4): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    // the (s, dir) entry point shares the memoized verified-pair table
    // with #26/#42 instead of rebuilding the inverted-index join here
    val pairs = TextOps.dedupNgramJaccard(s, dir, tau)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val lpa = Round9Ops2.labelPropDf(pairs, iters)
      .select(col("vec_id").as("doc_id"), col("community"))
    val lab = docs.join(lpa, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("community"), col("doc_id")).as("community"))
    val sizes = lab.groupBy(col("community"))
      .agg(count(lit(1)).as("community_size"))
    lab.join(sizes, "community")
      .select(col("doc_id"), col("community"), col("community_size"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the #26 exact shingle-Jaccard pair CTEs (the #42 oracle's
    * prefix), LPA rounds, isolate fill. */
  def dedupLpaCommunitiesSql(tau: Double = 0.3, iters: Int = 4): String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT id, community FROM (
         |    SELECT u.dst AS id, p.community, count(*) AS votes,
         |           row_number() OVER (PARTITION BY u.dst
         |             ORDER BY count(*) DESC, p.community) AS rn
         |    FROM ed u JOIN $prev p ON p.id = u.src
         |    GROUP BY u.dst, p.community)
         |  WHERE rn = 1)"""
    val rounds = (1 to iters).map(i => round(s"l${i - 1}", s"l$i")).mkString(",\n")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
       |),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |           unnest(CASE WHEN len(t) >= 3 THEN
       |             list_transform(range(1, len(t) - 1),
       |                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |           ELSE [] END) AS s
       |    FROM toks)
       |),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |jp AS (
       |  SELECT id_a, id_b
       |  FROM pairs JOIN cnt c1 ON id_a = c1.doc_id JOIN cnt c2 ON id_b = c2.doc_id
       |  WHERE floor((shared / (c1.n + c2.n - shared)) * 1e6 + 0.5) / 1e6 >= $tau
       |),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM jp
       |       UNION SELECT id_b, id_a FROM jp),
       |l0 AS (SELECT DISTINCT src AS id, src AS community FROM ed),
       |$rounds,
       |lab AS (
       |  SELECT d.doc_id, coalesce(l.community, d.doc_id) AS community
       |  FROM documents d LEFT JOIN l$iters l ON l.id = d.doc_id),
       |sizes AS (SELECT community, count(*) AS community_size FROM lab GROUP BY 1)
       |SELECT lab.doc_id, lab.community, sizes.community_size
       |FROM lab JOIN sizes USING (community)
       |ORDER BY lab.doc_id""".stripMargin
  }
}
