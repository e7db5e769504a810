package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._

/** Round-9 batch-20 operator (SURVEY §2 #347): community conductance.
  * (#346 `stream_style_divergence` lives in
  * [[graft.streaming.Streaming.streamStyleDivergence]] over the #343
  * registers.)
  */
object Round9Ops20 {

  // --------------------------------------- #347 graph_conductance

  /** #347 graph_conductance: CUT QUALITY of the #302 LPA partition —
    * per community, conductance φ = cut / min(vol, 2m − vol): the
    * share of a community's edge volume that LEAKS out of it. The
    * complementary verdict to #313 (modularity scores the partition
    * globally against a degree-preserving null; conductance grades
    * each community individually — a partition can score high Q while
    * hiding one leaky community that conductance exposes), and the
    * metric that decides whether a community is safe to treat as a
    * dedup/curation block on its own. Both derive from the SAME
    * rollup: cut = deg_sum − intra_arcs on the symmetrized arc table.
    *
    * Scale shape: identical to #313 — the arc table joins labels on
    * each endpoint (two key-proportional shuffles), one ≤|communities|
    * rollup, a broadcast 1-row arc total; φ is scalar arithmetic on
    * the bounded community table. */
  def graphConductance(s: SparkSession, dir: String, k: Int = 3,
                       iters: Int = 4): DataFrame =
    // rides the memoized symmetric edge set + converged LPA label
    // table shared with #302/#313 (identical partition by contract)
    conductanceCore(Round9Ops2.knnUndCached(s, dir, k),
                    Round9Ops2.lpaLabelsCached(s, dir, k, iters))

  /** DataFrame-generic core: directed (src, dst) edges, symmetrized
    * internally; partitions with the #302 LPA at the same rounds. */
  def conductanceDf(e: DataFrame, iters: Int): DataFrame = {
    val und = e.union(e.select(col("dst"), col("src")))
      .distinct().transform(graft.Lineage.pin)
    val lab = Round9Ops2.lpaRaw(und, iters)
      .transform(graft.Lineage.cut)
    conductanceCore(und, lab)
  }

  /** The conductance readout over an already-symmetrized edge table
    * and its (id, community) label table. */
  private def conductanceCore(und: DataFrame, lab: DataFrame): DataFrame = {
    val withLab = und
      .join(lab.select(col("id").as("src"), col("community").as("ca")), "src")
      .join(lab.select(col("id").as("dst"), col("community").as("cb")), "dst")
    val perC = withLab.groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("deg_sum"),
           sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("intra_arcs"))
    val nNodes = lab.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
    val tot = und.agg(count(lit(1)).as("arcs"))
    perC.join(nNodes, "community").crossJoin(broadcast(tot))
      .withColumn("cut_arcs", col("deg_sum") - col("intra_arcs"))
      .withColumn("conductance",
        r(col("cut_arcs").cast("double") /
          nullif(least(col("deg_sum"), col("arcs") - col("deg_sum"))
            .cast("double"), lit(0d)), 6))
      .select(col("community"), col("n_nodes"), col("deg_sum"),
              col("cut_arcs"), col("conductance"))
      .orderBy(col("community"))
  }

  def graphConductanceSql(k: Int = 3, iters: Int = 4): String = {
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
       |         CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
       |           AS intra_arcs
       |  FROM wl GROUP BY 1),
       |nn AS (SELECT community, count(*) AS n_nodes FROM l$iters GROUP BY 1),
       |tot AS (SELECT count(*) AS arcs FROM und)
       |SELECT p.community, n.n_nodes, p.deg_sum,
       |       p.deg_sum - p.intra_arcs AS cut_arcs,
       |       ${sqlR(
             "CAST(p.deg_sum - p.intra_arcs AS DOUBLE) / " +
             "nullif(CAST(least(p.deg_sum, t.arcs - p.deg_sum) AS DOUBLE), 0.0)",
             6)} AS conductance
       |FROM perc p JOIN nn n USING (community) CROSS JOIN tot t
       |ORDER BY p.community""".stripMargin
  }
}
