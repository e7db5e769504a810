package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-24 operators (SURVEY §2 #200-#203): warehouse
  * data-quality auditing (column profiler, referential integrity),
  * the Mann–Kendall non-parametric trend test, and a moment-identity
  * two-cohort embedding MMD test.
  */
object Round6Ops7 {

  // ------------------------------------------------------ #200 dq_profile

  /** lineitem's columns with their profile kind — the literal metadata
    * both engines compile into their plans (dtype strings differ
    * between engines, so the kind is pinned here, not reflected). */
  private[graft] val ProfileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "numeric", "l_partkey" -> "numeric",
    "l_suppkey" -> "numeric", "l_linenumber" -> "numeric",
    "l_quantity" -> "numeric", "l_extendedprice" -> "numeric",
    "l_discount" -> "numeric", "l_tax" -> "numeric",
    "l_returnflag" -> "string", "l_linestatus" -> "string",
    "l_shipdate" -> "timestamp")

  /** #200 dq_profile: the per-column DATA-QUALITY profile of the fact
    * table — for every column: row count, null count, exact distinct
    * count, and kind-appropriate extremes (numeric min/max/mean,
    * string lexicographic min/max, timestamp min/max as epoch micros).
    * The table a warehouse owner reads before trusting a new feed:
    * null-rate jumps, distinct-count collapses (a join key suddenly
    * constant) and range drift are the first symptoms of an upstream
    * break, long before any downstream query is wrong.
    *
    * Scale shape: ONE aggregate computes every metric; the multiple
    * exact count-distincts plan as Spark's Expand-based multi-distinct
    * (one shuffle, ×|distinct-groups| row expansion map-side) — the
    * honest price of exact cardinalities, paid once. At extreme scale
    * the drop-in degradation is `approx_count_distinct` per column
    * (HLL partials, no Expand), same plan otherwise. The long-format
    * readout unpacks the one-row result with a single explode (the
    * #199 discipline: the aggregate subplan appears exactly once). */
  def dqProfile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: ProfileCols.flatMap {
      case (c, kind) =>
        val base = Seq(count(col(c)).as(s"cnt_$c"),
                       countDistinct(col(c)).as(s"nd_$c"))
        val extremes = kind match {
          case "numeric" => Seq(
            min(col(c)).cast("double").as(s"min_$c"),
            max(col(c)).cast("double").as(s"max_$c"),
            r(dsum(col(c)) / count(col(c)), 6).as(s"mean_$c"))
          case "timestamp" => Seq(
            min(epochUs(col(c))).cast("double").as(s"min_$c"),
            max(epochUs(col(c))).cast("double").as(s"max_$c"))
          case _ => Seq(min(col(c)).as(s"smin_$c"), max(col(c)).as(s"smax_$c"))
        }
        base ++ extremes
    }
    val m = li.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val rows = ProfileCols.map { case (c, kind) =>
      struct(
        lit(c).as("col_name"), lit(kind).as("kind"),
        (col("n_rows") - col(s"cnt_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        (if (kind == "string") nullD else col(s"min_$c")).as("min_num"),
        (if (kind == "string") nullD else col(s"max_$c")).as("max_num"),
        (if (kind == "numeric") col(s"mean_$c") else nullD).as("mean_num"),
        (if (kind == "string") col(s"smin_$c") else nullS).as("min_str"),
        (if (kind == "string") col(s"smax_$c") else nullS).as("max_str"))
    }
    m.select(col("n_rows"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_name"), col("p.kind"), col("n_rows"),
              col("p.n_null"), col("p.n_distinct"), col("p.min_num"),
              col("p.max_num"), col("p.mean_num"), col("p.min_str"),
              col("p.max_str"))
      .orderBy(col("col_name"))
  }

  val dqProfileSql: String = {
    val aggs = "count(*) AS n_rows" +: ProfileCols.flatMap { case (c, kind) =>
      val base = Seq(s"count($c) AS cnt_$c",
                     s"count(DISTINCT $c) AS nd_$c")
      val extremes = kind match {
        case "numeric" => Seq(
          s"CAST(min($c) AS DOUBLE) AS min_$c",
          s"CAST(max($c) AS DOUBLE) AS max_$c",
          s"${sqlR(s"(${sqlSum(c)}) / count($c)", 6)} AS mean_$c")
        case "timestamp" => Seq(
          s"CAST(min(epoch_us($c)) AS DOUBLE) AS min_$c",
          s"CAST(max(epoch_us($c)) AS DOUBLE) AS max_$c")
        case _ => Seq(s"min($c) AS smin_$c", s"max($c) AS smax_$c")
      }
      base ++ extremes
    }
    val sel = ProfileCols.map { case (c, kind) =>
      val (minN, maxN) =
        if (kind == "string") ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
        else (s"min_$c", s"max_$c")
      val meanN = if (kind == "numeric") s"mean_$c" else "CAST(NULL AS DOUBLE)"
      val (minS, maxS) =
        if (kind == "string") (s"smin_$c", s"smax_$c")
        else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      s"""SELECT '$c' AS col_name, '${ProfileCols.toMap.apply(c)}' AS kind,
         |       CAST(n_rows AS BIGINT) AS n_rows,
         |       CAST(n_rows - cnt_$c AS BIGINT) AS n_null,
         |       CAST(nd_$c AS BIGINT) AS n_distinct,
         |       $minN AS min_num, $maxN AS max_num, $meanN AS mean_num,
         |       $minS AS min_str, $maxS AS max_str
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS (
       |  SELECT ${aggs.mkString(",\n         ")}
       |  FROM lineitem)
       |$sel
       |ORDER BY col_name""".stripMargin
  }

  // -------------------------------------------------- #201 dq_referential

  /** One foreign-key check: child rows aggregated to distinct keys, the
    * key table LEFT-joined against the parent's distinct keys, orphans
    * counted in both row and key units. NULL child keys count as
    * orphans (they match no parent — the strict reading; a feed that
    * starts emitting NULL keys should page, not pass). */
  private[graft] def fkCheck(name: String, child: DataFrame, childKey: String,
                             parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val pk = parent.select(col(parentKey).cast("long").as("k")).distinct()
      .withColumn("has_parent", lit(1))
    ck.join(pk, Seq("k"), "left")
      .agg(sum(col("n")).as("n_child_rows"),
           count(lit(1)).as("n_child_keys"),
           sum(when(col("has_parent").isNull, col("n")).otherwise(0L))
             .as("n_orphan_rows"),
           sum(when(col("has_parent").isNull, 1L).otherwise(0L))
             .as("n_orphan_keys"))
      .select(lit(name).as("fk"), col("n_child_rows"), col("n_child_keys"),
              col("n_orphan_rows"), col("n_orphan_keys"),
              when(col("n_child_rows") > 0,
                r(col("n_orphan_rows") / col("n_child_rows"), 6))
                .otherwise(lit(0.0)).as("orphan_row_rate"))
  }

  /** #201 dq_referential: the REFERENTIAL-INTEGRITY audit over the full
    * warehouse star — every declared foreign key checked for orphan
    * child rows (a key value with no parent row): lineitem→orders/
    * part/supplier, orders→customer, customer→nation, supplier→nation.
    * The audit every load pipeline runs after ingest: orphans mean the
    * feed delivered children before parents (ordering bug) or parents
    * were deleted in place (retention bug) — either silently drops rows
    * from every inner join downstream.
    *
    * Scale shape: per check, the child collapses to its distinct-key
    * counts FIRST (one key-proportional aggregate — orphan accounting
    * never touches child rows twice), then joins the parent's distinct
    * keys on the key — co-partitioned on the same key a warehouse
    * bucketing scheme would use; small parents (nation) broadcast under
    * AQE. Six one-row results union into the report. */
  def dqReferential(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val checks = Seq(
      fkCheck("lineitem.l_orderkey->orders.o_orderkey",
              li, "l_orderkey", Tables.orders(s, dir), "o_orderkey"),
      fkCheck("lineitem.l_partkey->part.p_partkey",
              li, "l_partkey", Tables.part(s, dir), "p_partkey"),
      fkCheck("lineitem.l_suppkey->supplier.s_suppkey",
              li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"),
      fkCheck("orders.o_custkey->customer.c_custkey",
              Tables.orders(s, dir), "o_custkey",
              Tables.customer(s, dir), "c_custkey"),
      fkCheck("customer.c_nationkey->nation.n_nationkey",
              Tables.customer(s, dir), "c_nationkey",
              Tables.nation(s, dir), "n_nationkey"),
      fkCheck("supplier.s_nationkey->nation.n_nationkey",
              Tables.supplier(s, dir), "s_nationkey",
              Tables.nation(s, dir), "n_nationkey"))
    checks.reduce(_ unionByName _).orderBy(col("fk"))
  }

  val dqReferentialSql: String = {
    def one(name: String, child: String, ck: String,
            parent: String, pk: String) =
      s"""SELECT '$name' AS fk,
         |       CAST(sum(n) AS BIGINT) AS n_child_rows,
         |       count(*) AS n_child_keys,
         |       CAST(sum(CASE WHEN p.k IS NULL THEN n ELSE 0 END) AS BIGINT)
         |         AS n_orphan_rows,
         |       CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_orphan_keys,
         |       CASE WHEN sum(n) > 0
         |            THEN ${sqlR("sum(CASE WHEN p.k IS NULL THEN n ELSE 0 END) / sum(n)", 6)}
         |            ELSE 0.0 END AS orphan_row_rate
         |FROM (SELECT CAST($ck AS BIGINT) AS k, count(*) AS n
         |      FROM $child GROUP BY 1) c
         |LEFT JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS k FROM $parent) p
         |  ON c.k = p.k""".stripMargin
    Seq(
      one("lineitem.l_orderkey->orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem.l_partkey->part.p_partkey",
          "lineitem", "l_partkey", "part", "p_partkey"),
      one("lineitem.l_suppkey->supplier.s_suppkey",
          "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      one("orders.o_custkey->customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"),
      one("customer.c_nationkey->nation.n_nationkey",
          "customer", "c_nationkey", "nation", "n_nationkey"),
      one("supplier.s_nationkey->nation.n_nationkey",
          "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
  }

  // ----------------------------------------------- #202 ts_mann_kendall

  /** #202 ts_mann_kendall: the Mann–Kendall non-parametric trend test
    * over each key's trailing-90-day daily series — S = Σ sign(v_j −
    * v_i) over ordered day pairs, tie-corrected variance Var(S) =
    * [n(n−1)(2n+5) − Σ tₖ(tₖ−1)(2tₖ+5)]/18, and the continuity-
    * corrected z — the distribution-free significance companion of
    * #88's Theil–Sen slope (Sen estimates HOW MUCH, MK says WHETHER;
    * together they are the standard robust trend battery, immune to
    * the outliers that break the #87b OLS t-test). Trend calls at the
    * two-sided 5% level (|z| > 1.96).
    *
    * Scale shape: identical to #88 — the pair self-join is bounded by
    * window² PER KEY (90 days → ≤4005 pairs), joined on the series key
    * so pair space is linear in keys; S and the tie terms are
    * integer-exact (signs compare 6dp-rounded daily means, so ties are
    * exact equality in both engines), and the only floating point is
    * the final /18, sqrt and z — each a single IEEE op chain. */
  def tsMannKendall(s: SparkSession, dir: String): DataFrame =
    tsMannKendallDf(Mhw.daily(s, dir))

  /** DataFrame-generic core: expects (user_id, d DATE, sst DOUBLE
    * 6dp-rounded). */
  def tsMannKendallDf(dl: DataFrame, windowDays: Int = 90): DataFrame = {
    val mx = dl.groupBy(col("user_id")).agg(max(col("d")).as("dmax"))
    val win = dl.join(graft.Hints.keyDim(mx), Seq("user_id"))
      .filter(datediff(col("dmax"), col("d")) < windowDays)
      .select(col("user_id"), col("d"), col("sst"))
    val a = win.select(col("user_id"), col("d").as("d1"), col("sst").as("v1"))
    val b = win.select(col("user_id"), col("d").as("d2"), col("sst").as("v2"))
    val sgn = when(col("v2") > col("v1"), 1L)
      .when(col("v2") < col("v1"), -1L).otherwise(0L)
    val sAgg = a.join(b, Seq("user_id")).filter(col("d2") > col("d1"))
      .groupBy(col("user_id"))
      .agg(sum(sgn).as("s_stat"), count(lit(1)).as("n_pairs"))
    val ties = win.groupBy(col("user_id"), col("sst"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("user_id"))
      .agg(sum(col("t")).as("n_days"),
           sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
             .as("tie_term"))
    val varS = (col("n_days") * (col("n_days") - 1) *
                (lit(2) * col("n_days") + 5) - col("tie_term")) / lit(18.0)
    sAgg.join(ties, Seq("user_id"))
      .withColumn("var_s", r(varS, 6))
      .withColumn("z",
        when(col("var_s") > 0,
          when(col("s_stat") > 0,
            r((col("s_stat") - 1) / sqrt(col("var_s")), 6))
          .when(col("s_stat") < 0,
            r((col("s_stat") + 1) / sqrt(col("var_s")), 6))
          .otherwise(lit(0.0)))
        .otherwise(lit(0.0)))
      .withColumn("trend",
        when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing").otherwise("none"))
      .select(col("user_id"), col("n_days"), col("n_pairs"), col("s_stat"),
              col("var_s"), col("z"), col("trend"))
      .orderBy(col("user_id"))
  }

  def tsMannKendallSql(windowDays: Int = 90): String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d,
       |         ${sqlAvg("value", 6)} AS sst
       |  FROM events GROUP BY 1, 2),
       |mx AS (SELECT user_id, max(d) AS dmax FROM daily GROUP BY 1),
       |win AS (
       |  SELECT dl.user_id, dl.d, dl.sst
       |  FROM daily dl JOIN mx USING (user_id)
       |  WHERE datediff('day', dl.d, mx.dmax) < $windowDays),
       |sp AS (
       |  SELECT a.user_id,
       |         CAST(sum(CASE WHEN b.sst > a.sst THEN 1
       |                       WHEN b.sst < a.sst THEN -1 ELSE 0 END) AS BIGINT)
       |           AS s_stat,
       |         count(*) AS n_pairs
       |  FROM win a JOIN win b ON a.user_id = b.user_id AND b.d > a.d
       |  GROUP BY 1),
       |tie AS (
       |  SELECT user_id, CAST(sum(t) AS BIGINT) AS n_days,
       |         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
       |  FROM (SELECT user_id, sst, count(*) AS t FROM win GROUP BY 1, 2)
       |  GROUP BY 1),
       |v AS (
       |  SELECT sp.user_id, n_days, n_pairs, s_stat,
       |         ${sqlR("(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term) / 18.0", 6)} AS var_s
       |  FROM sp JOIN tie USING (user_id)),
       |z AS (
       |  SELECT user_id, n_days, n_pairs, s_stat, var_s,
       |         CASE WHEN var_s > 0 THEN
       |           CASE WHEN s_stat > 0 THEN ${sqlR("(s_stat - 1) / sqrt(var_s)", 6)}
       |                WHEN s_stat < 0 THEN ${sqlR("(s_stat + 1) / sqrt(var_s)", 6)}
       |                ELSE 0.0 END
       |         ELSE 0.0 END AS z
       |  FROM v)
       |SELECT user_id, n_days, n_pairs, s_stat, var_s, z,
       |       CASE WHEN z > 1.96 THEN 'increasing'
       |            WHEN z < -1.96 THEN 'decreasing'
       |            ELSE 'none' END AS trend
       |FROM z ORDER BY user_id""".stripMargin

  // ----------------------------------------------------- #203 emb_mmd

  /** Leading dimensions the MMD second-moment matrices run over (the
    * #59 covariance discipline: d² partials per vector, so d is
    * bounded deliberately). */
  val MmdDims = 16

  /** #203 emb_mmd: two-cohort distribution test via the quadratic-
    * kernel Maximum Mean Discrepancy — for the even-id vs odd-id
    * cohorts (the #113/#170 split), MMD² under k(x,y) = (x·y)² equals
    * ‖M₁ − M₂‖²_F where M_c = E[xxᵀ] is each cohort's second-moment
    * matrix: the O(n²) pairwise-kernel statistic collapses to moment
    * algebra (the #162 anisotropy identity, one level up). #113 compares
    * cohort MEANS — blind to a shift in spread or orientation at equal
    * centroids; this catches exactly those second-order drifts (an
    * encoder update that rotates or shrinks the space). Per (i,j): both
    * cohort moments, the Frobenius contribution (off-diagonals weighted
    * ×2), plus the corpus MMD² total.
    *
    * Scale shape: ONE pass over the corpus fans each vector into its
    * d(d+1)/2 upper-triangle products (map-side, the #59 shape, d
    * bounded at [[MmdDims]]); both cohorts aggregate in the same
    * groupBy via conditional sums (no cohort join); everything after is
    * algebra on the 136-row model table. The pairwise kernel matrix
    * never materializes. */
  def embMmd(s: SparkSession, dir: String): DataFrame =
    embMmdDf(Tables.embeddings(s, dir))

  /** DataFrame-generic core: expects (vec_id, embedding ARRAY<FLOAT>). */
  def embMmdDf(emb: DataFrame, d: Int = MmdDims): DataFrame = {
    val pairs = emb
      .select((col("vec_id") % 2 === 0).as("even"),
              slice(col("embedding"), 1, d).as("e"))
      .select(col("even"), col("e"), posexplode(col("e")).as(Seq("i0", "xr")))
      .select(col("even"), (col("i0") + 1).as("i"),
              col("xr").cast("double").as("x"),
              posexplode(col("e")).as(Seq("j0", "yr")))
      .select(col("even"), col("i"), (col("j0") + 1).as("j"),
              col("x"), col("yr").cast("double").as("y"))
      .filter(col("j") >= col("i"))
    val m = pairs.groupBy(col("i"), col("j"))
      .agg(dsum(when(col("even"), col("x") * col("y"))).as("s_even"),
           sum(when(col("even"), 1L).otherwise(0L)).as("n_even"),
           dsum(when(!col("even"), col("x") * col("y"))).as("s_odd"),
           sum(when(!col("even"), 1L).otherwise(0L)).as("n_odd"))
    val w = when(col("i") === col("j"), lit(1.0)).otherwise(lit(2.0))
    val diff = col("m_even") - col("m_odd")
    val wAll = Window.partitionBy()
    m.withColumn("m_even",
        when(col("n_even") > 0, r(col("s_even") / col("n_even"), 6)))
      .withColumn("m_odd",
        when(col("n_odd") > 0, r(col("s_odd") / col("n_odd"), 6)))
      .withColumn("diff2", r(w * diff * diff, 6))
      .withColumn("mmd2",
        r(sum(col("diff2").cast("decimal(38,10)")).over(wAll)
            .cast("double"), 6))
      .select(col("i"), col("j"), col("n_even"), col("n_odd"),
              col("m_even"), col("m_odd"), col("diff2"), col("mmd2"))
      .orderBy(col("i"), col("j"))
  }

  def embMmdSql(d: Int = MmdDims): String =
    s"""WITH pairs AS (
       |  SELECT (vec_id % 2 = 0) AS even, ii.i AS i, jj.j AS j,
       |         CAST(embedding[ii.i] AS DOUBLE) AS x,
       |         CAST(embedding[jj.j] AS DOUBLE) AS y
       |  FROM embeddings, range(1, ${d + 1}) ii(i), range(1, ${d + 1}) jj(j)
       |  WHERE jj.j >= ii.i),
       |m AS (
       |  SELECT i, j,
       |         ${sqlSum("CASE WHEN even THEN x * y END")} AS s_even,
       |         CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
       |         ${sqlSum("CASE WHEN NOT even THEN x * y END")} AS s_odd,
       |         CAST(sum(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
       |  FROM pairs GROUP BY 1, 2),
       |e AS (
       |  SELECT i, j, n_even, n_odd,
       |         CASE WHEN n_even > 0 THEN ${sqlR("s_even / n_even", 6)} END AS m_even,
       |         CASE WHEN n_odd > 0 THEN ${sqlR("s_odd / n_odd", 6)} END AS m_odd
       |  FROM m),
       |f AS (
       |  SELECT i, j, n_even, n_odd, m_even, m_odd,
       |         ${sqlR("(CASE WHEN i = j THEN 1.0 ELSE 2.0 END) * (m_even - m_odd) * (m_even - m_odd)", 6)} AS diff2
       |  FROM e)
       |SELECT i, j, n_even, n_odd, m_even, m_odd, diff2,
       |       ${sqlR("CAST(sum(CAST(diff2 AS DECIMAL(38,10))) OVER () AS DOUBLE)", 6)} AS mmd2
       |FROM f ORDER BY i, j""".stripMargin
}
