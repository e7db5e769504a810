package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Similarity ops (SURVEY §2 #95-#96, #113, #162): binary Hamming
  * sketch kNN, maximal-marginal-relevance diversity selection, centroid
  * drift monitoring, and the anisotropy health check.
  */
object Similarity2 {

  // ----------------------------------------------- #95 Hamming-sketch kNN

  /** One 32-bit half of the sign sketch: bit i set iff component
    * offset+i is positive. Packed by a bounded fold over the index
    * sequence — exact integer arithmetic, identical in the oracle. */
  private[graft] def packBits(offset: Int): Column = expr(
    s"""aggregate(sequence(0, 31), CAST(0 AS BIGINT),
       | (acc, i) -> acc + CASE
       |   WHEN element_at(embedding, i + ${offset + 1}) > CAST(0 AS FLOAT)
       |   THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)"""
      .stripMargin.replace('\n', ' '))

  /** #95 emb_hamming_knn: approximate kNN over 1-bit sign sketches —
    * each 64-float vector compresses to TWO longs (64 bits, a 128×
    * memory cut vs float32), and candidate distance is a popcount over
    * XOR-ed words. This is the sketch that makes a 100 TB vector corpus
    * scannable: the packed table is ~16 B/vector, the scan is map-only
    * against a broadcast query set, and per-query results come from
    * bounded map-side top-k heaps (collect_top_k) — no ranking window,
    * no shuffle of scored pairs. Sign-of-component is the classic SimHash
    * family with identity hyperplanes (embeddings arrive ~zero-centered);
    * ordering ties break on vec_id for determinism. */
  /** (vec_id, lo, hi) sign-sketch packing — the ONE definition of the
    * 64-bit sketch, shared with the streaming kNN so the stream/batch
    * bit-identity can't silently split. */
  private[graft] def packCols(df: DataFrame): DataFrame =
    df.select(col("vec_id"), packBits(0).as("lo"), packBits(32).as("hi"))

  /** The broadcastable query-side projection of a packed frame. */
  private[graft] def packedQueries(packed: DataFrame, nQueries: Int): DataFrame =
    packed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("lo").as("q_lo"), col("hi").as("q_hi"))

  /** XOR-popcount distance between a packed row and a packed query. */
  private[graft] def hammingExpr: Column =
    (expr("bit_count(lo ^ q_lo)") + expr("bit_count(hi ^ q_hi)")).cast("int")

  def embHammingKnn(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 5): DataFrame =
    // queries×k-row result memoized per (corpus, params): #124 rank
    // fusion and the #146 bake-off re-retrieve the same lists
    graft.Caches.persisted(s, ("hamming_knn", dir, k, nQueries)) {
      embHammingKnnUncached(s, dir, k, nQueries)
    }

  private def embHammingKnnUncached(s: SparkSession, dir: String,
                                    k: Int, nQueries: Int): DataFrame = {
    graft.functions.GraftFunctions.ensure(s)
    val packed = packCols(Tables.embeddings(s, dir))
    val qs = packedQueries(packed, nQueries)
    packed.join(broadcast(qs), col("vec_id") =!= col("q_id"))
      .withColumn("hamming", hammingExpr)
      .groupBy(col("q_id"))
      .agg(call_function("collect_top_k",
        struct((-col("hamming")).as("neg_h"), (-col("vec_id")).as("neg_id")),
        lit(k), lit(false)).as("arr"))
      .select(col("q_id"), posexplode(reverse(array_sort(col("arr")))))
      .select(col("q_id"), (-col("col.neg_id")).as("vec_id"),
              (-col("col.neg_h")).cast("int").as("hamming"),
              (col("pos") + 1).cast("int").as("rank"))
  }

  /** Oracle for [[embHammingKnn]], parameterized exactly like the
    * operator (k, nQueries) so non-default calls can't silently diverge
    * from the SQL (same interpolation pattern as [[embMmrSql]]). */
  def embHammingKnnSql(k: Int = 5, nQueries: Int = 5): String = {
    def pack(off: Int): String =
      s"""CAST(list_sum(list_transform(range(0, 32),
         | i -> CASE WHEN embedding[i + ${off + 1}] > 0
         |      THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
         | AS BIGINT)""".stripMargin.replace('\n', ' ')
    s"""WITH packed AS (
       |  SELECT vec_id, ${pack(0)} AS lo, ${pack(32)} AS hi FROM embeddings),
       |q AS (SELECT vec_id AS q_id, lo AS q_lo, hi AS q_hi FROM packed
       |      WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.q_id, p.vec_id,
       |         CAST(bit_count(xor(p.lo, q.q_lo)) + bit_count(xor(p.hi, q.q_hi)) AS INT) AS hamming
       |  FROM packed p JOIN q ON p.vec_id <> q.q_id)
       |SELECT q_id, vec_id, hamming, CAST(rank AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }

  // -------------------------------------------------- #113 centroid drift

  /** #113 emb_centroid_drift: embedding DISTRIBUTION-SHIFT monitor —
    * split the corpus into two cohorts (here: vec_id parity standing in
    * for yesterday/today), compare per-label centroids, report the L2
    * drift per label. The production early-warning for upstream
    * encoder/data changes: centroids are label-count × dim aggregates
    * (map-side combinable, nothing key-proportional crosses the wire),
    * the drift compare is a |labels|-row join. Decimal-exact component
    * means, 6dp-rounded before the distance so the oracle replays
    * bit-identically. */
  def embCentroidDrift(s: SparkSession, dir: String): DataFrame =
    embCentroidDriftDf(Tables.embeddings(s, dir))

  /** DataFrame-generic core (the spec drives a synthetic twin frame
    * through THIS path). One conditional-aggregation pass computes both
    * cohorts' centroids — the corpus explodes and shuffles once, no
    * cohort join. `vec_id % 2` (signed, like the oracle's `%`), not
    * pmod, so the cohort rule stays definitionally identical to the
    * SQL for any id domain. Labels present in only one cohort are
    * dropped (the oracle's inner-join semantics). */
  def embCentroidDriftDf(emb: DataFrame): DataFrame = {
    // both cohort predicates spelled like the oracle's (`% 2 = 0` /
    // `% 2 = 1`, signed): a negative id lands in NEITHER cohort in both
    // engines, rather than defaulting into B via negation
    val e = emb.select(col("label"), (col("vec_id") % 2).as("par"),
                       posexplode(col("embedding")))
      .select(col("label"), col("par"), col("pos"),
              col("col").cast("double").as("x"))
    val xa = when(col("par") === 0, col("x"))
    val xb = when(col("par") === 1, col("x"))
    e.groupBy(col("label"), col("pos"))
      .agg(graft.Parity.davg(xa, 6).as("ca"), count(xa).as("na"),
           graft.Parity.davg(xb, 6).as("cb"), count(xb).as("nb"))
      .filter(col("na") > 0 && col("nb") > 0)
      .groupBy(col("label"))
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
           r(sqrt(dsum((col("ca") - col("cb")) * (col("ca") - col("cb")))), 6)
             .as("drift_l2"))
      .orderBy(col("label"))
  }

  val embCentroidDriftSql: String = {
    val davg6 = "floor((CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / count(x)) * 1e6 + 0.5) / 1e6"
    s"""WITH e AS (
       |  SELECT vec_id, label, u.i AS pos, CAST(embedding[u.i + 1] AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN LATERAL
       |    (SELECT unnest(range(0, len(embedding))) AS i) u),
       |ca AS (SELECT label, pos, $davg6 AS c, count(*) AS n
       |       FROM e WHERE vec_id % 2 = 0 GROUP BY 1, 2),
       |cb AS (SELECT label, pos, $davg6 AS c, count(*) AS n
       |       FROM e WHERE vec_id % 2 = 1 GROUP BY 1, 2)
       |SELECT ca.label,
       |       CAST(min(ca.n) AS BIGINT) AS n_a,
       |       CAST(min(cb.n) AS BIGINT) AS n_b,
       |       ${sqlR("sqrt(CAST(sum(CAST((ca.c - cb.c) * (ca.c - cb.c) AS DECIMAL(38,10))) AS DOUBLE))", 6)} AS drift_l2
       |FROM ca JOIN cb ON ca.label = cb.label AND ca.pos = cb.pos
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------- #96 MMR

  /** #96 emb_mmr: maximal-marginal-relevance selection (Carbonell &
    * Goldstein 1998) — the diversity-aware shortlist builder of a
    * curation/retrieval pipeline: greedily pick the candidate maximizing
    * λ·sim(query, d) − (1−λ)·max_{s∈S} sim(d, s).
    *
    * Scale shape: ONE distributed pass computes every candidate's
    * query-relevance cosine and keeps the top-`shortlist` rows
    * (TakeOrdered — map-side partial top-N, no ranking window); the k
    * inherently-sequential greedy rounds then run driver-local over the
    * collected shortlist (≤ N·dim floats, ~1 MB at the 4096 default —
    * model-sized, like the IVF centroid collects). The round-5 shape ran
    * k full corpus scans + k driver round-trips; at 100× corpus scale
    * those k passes dominate, while the shortlist pass is one scan
    * regardless of k. Greedy MMR only ever selects high-relevance items
    * (the penalty term is bounded by 1, so anything with
    * λ·sq < λ·sq_N − (1−λ) can never win); with N ≫ k the shortlist
    * selection equals the full-corpus selection — spec-pinned against
    * [[embMmrFullScan]] on the test SF.
    *
    * Driver-side arithmetic replicates the distributed expressions
    * bit-for-bit: products cast to DECIMAL(18,10) (Spark cast = shortest
    * decimal repr, HALF_UP — `BigDecimal.valueOf`), exact decimal
    * accumulation, IEEE `floor(x·1e6 + 0.5)/1e6` rounding — so the
    * result still hash-matches the full-corpus CTE oracle.
    *
    * SOUNDNESS CERTIFICATE: relevance alone does not bound MMR when
    * cosines can be NEGATIVE — an outside candidate's score can reach
    * λ·sq + (1−λ) (penalty ≥ −1). So the shortlist is fetched as N+1
    * rows: the (N+1)-th relevance is the outside cutoff, and after the
    * greedy rounds every picked score is checked against the outside
    * upper bound λ·sq_cutoff + (1−λ). Certificate holds (always, when
    * the corpus fits the shortlist) → the selection is PROVABLY equal
    * to the full-corpus greedy; certificate fails → fall back to the
    * exact distributed loop ([[embMmrFullScan]]) rather than silently
    * approximate. */
  def embMmr(s: SparkSession, dir: String, k: Int = 5, lam: Double = 0.7,
             shortlist: Int = 4096): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_n"))
    val base = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"), col("nrm"),
              r(dotDec(col("embedding"), col("q_emb")) / (col("nrm") * col("q_n")), 6)
                .as("sq"))
    val fetched = base.orderBy(col("sq").desc, col("vec_id")).limit(shortlist + 1)
      .collect()
      .map(row => (row.getLong(0), row.getSeq[Float](1).toArray,
                   row.getDouble(2), row.getDouble(3)))
    val (cands, overflow) = fetched.splitAt(shortlist)
    val picked = greedyLocal(cands, k, lam)
    val certified = overflow.isEmpty || {
      val outsideBound = lam * overflow.head._4 + (1 - lam)
      picked.forall(_._2 >= outsideBound)
    }
    if (certified) mmrResult(s, picked)
    else embMmrFullScan(s, dir, k, lam)
  }

  /** Driver-local replica of [[graft.functions.VectorFunctions.dotDec]]:
    * per-term double product → DECIMAL(18,10) via the same
    * shortest-decimal-representation HALF_UP cast Spark uses, exact
    * decimal accumulation, final double. */
  private[graft] def dotDecLocal(a: Array[Float], b: Array[Float]): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < a.length) {
      acc = acc.add(java.math.BigDecimal.valueOf(a(i).toDouble * b(i).toDouble)
        .setScale(10, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue
  }

  /** The k greedy rounds over (id, emb, nrm, sq) candidates, identical
    * selection rule to the distributed loop: argmax score, vec_id
    * tie-break; round 1 score = r6(λ·sq), later rounds
    * r6(λ·sq − (1−λ)·max r6(cosine(cand, sel))). */
  private def greedyLocal(cands: Array[(Long, Array[Float], Double, Double)],
                          k: Int, lam: Double): Vector[(Long, Double)] = {
    var picked = Vector.empty[(Long, Double)]
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Array[Float], Double)]
    val taken = scala.collection.mutable.HashSet.empty[Long]
    while (picked.size < k && taken.size < cands.length) {
      var bestId = Long.MaxValue
      var bestScore = Double.NegativeInfinity
      cands.foreach { case (id, e, nrm, sq) =>
        if (!taken.contains(id)) {
          val score =
            if (sel.isEmpty) graft.Parity.r6d(lam * sq)
            else {
              var pen = Double.NegativeInfinity
              sel.foreach { case (se, sn) =>
                val c = graft.Parity.r6d(dotDecLocal(e, se) / (nrm * sn))
                if (c > pen) pen = c
              }
              graft.Parity.r6d(lam * sq - (1 - lam) * pen)
            }
          if (score > bestScore || (score == bestScore && id < bestId)) {
            bestScore = score; bestId = id
          }
        }
      }
      if (bestId == Long.MaxValue) return picked
      picked :+= ((bestId, bestScore))
      taken += bestId
      val c = cands.find(_._1 == bestId).get
      sel += ((c._2, c._3))
    }
    picked
  }

  private def mmrResult(s: SparkSession, picked: Vector[(Long, Double)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      picked.zipWithIndex.map { case ((id, sc), i) =>
        org.apache.spark.sql.Row(i + 1, id, sc)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType, false))))
  }

  /** The round-5 distributed greedy loop — k corpus passes, one
    * TakeOrdered(1) collect per round. Kept (unregistered) as the
    * exact full-corpus baseline the shortlist path is spec-pinned
    * against; [[embMmr]] is the scale path. */
  private[graft] def embMmrFullScan(s: SparkSession, dir: String, k: Int = 5,
                                    lam: Double = 0.7): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_n"))
    val base = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"), col("nrm"),
              r(dotDec(col("embedding"), col("q_emb")) / (col("nrm") * col("q_n")), 6)
                .as("sq"))
      .localCheckpoint()
    var picked = Vector.empty[(Long, Double)]
    var exhausted = false
    while (picked.size < k && !exhausted) {
      val ids = picked.map(_._1)
      val next =
        if (ids.isEmpty)
          base.select(col("vec_id"), r(lit(lam) * col("sq"), 6).as("score"))
        else {
          val sel = base.filter(col("vec_id").isin(ids: _*))
            .select(col("vec_id").as("s_id"), col("embedding").as("s_emb"),
                    col("nrm").as("s_n"))
          base.filter(!col("vec_id").isin(ids: _*))
            .crossJoin(broadcast(sel))
            .groupBy(col("vec_id"), col("sq"))
            .agg(max(r(dotDec(col("embedding"), col("s_emb")) /
                       (col("nrm") * col("s_n")), 6)).as("pen"))
            .select(col("vec_id"),
                    r(lit(lam) * col("sq") - lit(1 - lam) * col("pen"), 6).as("score"))
        }
      val rows = next.orderBy(col("score").desc, col("vec_id")).limit(1).collect()
      // candidate pool exhausted (corpus smaller than k): return the
      // shorter shortlist rather than failing the selection
      if (rows.isEmpty) exhausted = true
      else picked :+= ((rows(0).getLong(0), rows(0).getDouble(1)))
    }
    mmrResult(s, picked)
  }

  /** Chained-CTE replay of the greedy loop (same technique as the
    * pagerank / k-means oracles): round i's CTE picks argmax score over
    * candidates not yet in sel(i-1), penalty from a correlated max over
    * the ≤(i-1)-row selected set. */
  def embMmrSql(k: Int = 5, lam: Double = 0.7): String = {
    val r6 = (x: String) => sqlR(x, 6)
    val sb = new StringBuilder
    sb ++= s"""WITH emb0 AS (SELECT vec_id, embedding FROM embeddings),
              |q AS (SELECT embedding AS q_emb FROM emb0 WHERE vec_id = 0),
              |base AS (
              |  SELECT e.vec_id, e.embedding,
              |         ${r6(sqlCosine("e.embedding", "q.q_emb"))} AS sq
              |  FROM emb0 e CROSS JOIN q WHERE e.vec_id <> 0),
              |s1 AS (SELECT * FROM (
              |  SELECT vec_id, 1 AS rnk, ${r6(s"$lam * sq")} AS score FROM base)
              |  ORDER BY score DESC, vec_id LIMIT 1),
              |sel1 AS (SELECT vec_id FROM s1)""".stripMargin
    for (i <- 2 to k) {
      val p = i - 1
      sb ++= s""",
                |c$i AS (
                |  SELECT b.vec_id, b.sq,
                |         (SELECT max(${r6(sqlCosine("b.embedding", "e.embedding"))})
                |          FROM base e WHERE e.vec_id IN (SELECT vec_id FROM sel$p)) AS pen
                |  FROM base b WHERE b.vec_id NOT IN (SELECT vec_id FROM sel$p)),
                |s$i AS (SELECT * FROM (
                |  SELECT vec_id, $i AS rnk, ${r6(s"$lam * sq - ${1 - lam} * pen")} AS score
                |  FROM c$i)
                |  ORDER BY score DESC, vec_id LIMIT 1),
                |sel$i AS (SELECT vec_id FROM sel$p UNION ALL SELECT vec_id FROM s$i)"""
        .stripMargin
    }
    sb ++= s"""
              |SELECT CAST(rnk AS INT) AS rank, vec_id, score
              |FROM (${(1 to k).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")})
              |ORDER BY rank""".stripMargin
    sb.toString
  }

  // ------------------------------------------------- #162 emb_anisotropy

  /** #162 emb_anisotropy: embedding-space isotropy diagnostics
    * (Ethayarajh 2019) — per label cluster and for the whole corpus:
    * the EXACT mean pairwise cosine between distinct unit-normalized
    * vectors and the centroid norm. High anisotropy (mean cosine ≫ 0)
    * means the embedding model wastes its space in a narrow cone —
    * cosine thresholds for dedup (#31f/#32) and retrieval (#30) stop
    * discriminating; this is the health check run BEFORE tuning them.
    *
    * Scale shape: the naive statistic is an all-pairs O(n²) scan, but
    * over unit vectors it collapses to the algebraic identity
    * mean_{i≠j} cos(i,j) = (‖Σu‖² − Σ‖u‖²) / (n(n−1)) — ONE map-only
    * pass: per-(label, dimension) decimal partial sums (Σu_c, Σu_c²),
    * re-aggregated per label and (exactly, decimal partials summing
    * losslessly) corpus-wide on a |labels|×dim model table. The
    * quadratic object is never materialized at any scale. */
  def embAnisotropy(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.embeddings(s, dir)
      .select(col("label"), col("embedding"), norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "x")),
              col("nrm"))
      .select(col("label"), col("p"),
              (col("x").cast("double") / col("nrm")).as("u"))
    val part = u.groupBy(col("label"), col("p"))
      .agg(sum(col("u").cast("decimal(18,10)")).as("s_dec"),
           sum((col("u") * col("u")).cast("decimal(18,10)")).as("q_dec"),
           count(lit(1)).as("n"))
    val both = part
      .select(col("label").cast("string").as("scope"),
              col("p"), col("s_dec").cast("decimal(38,10)").as("s_dec"),
              col("q_dec").cast("decimal(38,10)").as("q_dec"), col("n"))
      .unionByName(part.groupBy(col("p"))
        .agg(sum(col("s_dec")).as("s_dec"), sum(col("q_dec")).as("q_dec"),
             sum(col("n")).as("n"))
        .select(lit("ALL").as("scope"), col("p"),
                col("s_dec").cast("decimal(38,10)").as("s_dec"),
                col("q_dec").cast("decimal(38,10)").as("q_dec"), col("n")))
    both.groupBy(col("scope"))
      .agg(max(col("n")).cast("long").as("n_vectors"),
           // s² terms at (38,10): s_dec ≤ n, so s² needs ≥ 2·log10(n)
           // integer digits — (28,10) would overflow (NULL in Spark,
           // error in DuckDB) past ~1e9 vectors in an anisotropic space
           sum((col("s_dec").cast("double") * col("s_dec").cast("double"))
             .cast("decimal(38,10)")).cast("double").as("s2"),
           sum(col("q_dec")).cast("double").as("u2"))
      .select(col("scope"), col("n_vectors"),
              when(col("n_vectors") > 1,
                r((col("s2") - col("u2")) /
                  (col("n_vectors") * (col("n_vectors") - 1)), 6))
                .as("mean_pairwise_cosine"),
              r(sqrt(col("s2")) / col("n_vectors"), 6).as("centroid_norm"))
      .orderBy(col("scope"))
  }

  val embAnisotropySql: String =
    s"""WITH base AS (
       |  SELECT label, embedding, ${sqlNorm("embedding")} AS nrm FROM embeddings),
       |u AS (
       |  SELECT label, i.i AS p, CAST(embedding[i.i] AS DOUBLE) / nrm AS u
       |  FROM base, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) i
       |  WHERE nrm > 0),
       |part AS (
       |  SELECT label, p, sum(CAST(u AS DECIMAL(18,10))) AS s_dec,
       |         sum(CAST(u * u AS DECIMAL(18,10))) AS q_dec, count(*) AS n
       |  FROM u GROUP BY 1, 2),
       |uni AS (
       |  SELECT CAST(label AS VARCHAR) AS scope, p,
       |         CAST(s_dec AS DECIMAL(38,10)) AS s_dec,
       |         CAST(q_dec AS DECIMAL(38,10)) AS q_dec, n
       |  FROM part
       |  UNION ALL
       |  SELECT 'ALL', p, CAST(sum(s_dec) AS DECIMAL(38,10)),
       |         CAST(sum(q_dec) AS DECIMAL(38,10)), sum(n)
       |  FROM part GROUP BY p),
       |fin AS (
       |  SELECT scope, CAST(max(n) AS BIGINT) AS n_vectors,
       |         CAST(sum(CAST(CAST(s_dec AS DOUBLE) * CAST(s_dec AS DOUBLE)
       |           AS DECIMAL(38,10))) AS DOUBLE) AS s2,
       |         CAST(sum(q_dec) AS DOUBLE) AS u2
       |  FROM uni GROUP BY 1)
       |SELECT scope, n_vectors,
       |       CASE WHEN n_vectors > 1
       |            THEN ${sqlR("(s2 - u2) / (n_vectors * (n_vectors - 1))", 6)}
       |       END AS mean_pairwise_cosine,
       |       ${sqlR("sqrt(s2) / n_vectors", 6)} AS centroid_norm
       |FROM fin ORDER BY scope""".stripMargin
}
