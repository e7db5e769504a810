package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.Parity._
import graft.sources.Tables

/** Warehouse/pipeline analytics beyond the straight TPC-H set
  * (SURVEY §2 H): multi-dimensional rollups, skew-safe salted
  * aggregation, z-score anomaly flags, deterministic stratified
  * sampling, per-label embedding centroids, and connected-components
  * duplicate clustering.
  */
object Analytics {

  private val Dec = DataTypes.createDecimalType(38, 10)

  /** #37 ROLLUP over (event_type, day) with a grouping id — the
    * multi-dimensional aggregate shape (cube/rollup are one shuffle;
    * partial aggs cover every grouping set). NULL grouping slots are
    * coalesced to sentinels so the oracle compare is total-order safe. */
  def eventsRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .rollup(col("event_type"), to_date(col("ts")).as("day"))
      .agg(grouping_id().cast("long").as("gid"),
           count(lit(1)).as("n"), dsum(col("value"), 4).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
              coalesce(col("day"), lit("1900-01-01").cast("date")).as("day"),
              col("gid"), col("n"), col("sum_value"))

  val eventsRollupSql: String =
    s"""SELECT coalesce(event_type, 'ALL') AS event_type,
       |       coalesce(CAST(ts AS DATE), DATE '1900-01-01') AS day,
       |       CAST(2 * grouping(event_type) + grouping(CAST(ts AS DATE)) AS BIGINT) AS gid,
       |       count(*) AS n, ${sqlSum("value", 4)} AS sum_value
       |FROM events
       |GROUP BY ROLLUP(event_type, CAST(ts AS DATE))""".stripMargin

  /** #38 salted two-phase aggregation: the skew-mitigation shape for
    * hot keys at 100 TB — phase 1 aggregates on (key, salt) so no single
    * reducer owns a hot key, phase 2 merges the ≤16 partials per key.
    * Decimal accumulation is associative, so the result is bit-identical
    * to the direct aggregate (the oracle runs the direct form). */
  def eventsSaltedAgg(s: SparkSession, dir: String, salts: Int = 16): DataFrame =
    Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value").cast(Dec)).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("event_type"))
      .agg(r(sum(col("ps")).cast("double"), 4).as("sum_value"),
           sum(col("pc")).cast("long").as("n"))

  val eventsSaltedAggSql: String =
    s"""SELECT event_type, ${sqlSum("value", 4)} AS sum_value,
       |       count(*) AS n
       |FROM events GROUP BY 1""".stripMargin

  /** #39 z-score anomaly flags per series: mean/variance from exact
    * decimal sums (one partial-agg pass), broadcast back, |z| > 3. The
    * var formula (E[x²] − E[x]²) is one pass — no second scan. */
  def eventsAnomaly(s: SparkSession, dir: String, zTau: Double = 3.0): DataFrame = {
    val ev = Tables.events(s, dir)
    val stats = ev.groupBy(col("user_id").as("su"))
      .agg(dsum(col("value")).as("sv"),
           dsum(col("value") * col("value")).as("svv"),
           count(lit(1)).as("n"))
      .select(col("su"), (col("sv") / col("n")).as("mean"),
        sqrt(greatest(col("svv") / col("n") -
          (col("sv") / col("n")) * (col("sv") / col("n")), lit(0.0)) + 1e-9).as("std"))
    ev.join(broadcast(stats), col("user_id") === col("su"))
      .withColumn("z", r((col("value") - col("mean")) / col("std"), 4))
      .filter(abs(col("z")) > zTau)
      .select(col("event_id"), col("user_id"), col("value"), col("z"))
  }

  val eventsAnomalySql: String =
    s"""WITH stats AS (
       |  SELECT user_id AS su,
       |         ${sqlSum("value")} / count(*) AS mean,
       |         sqrt(GREATEST(${sqlSum("value * value")} / count(*)
       |              - (${sqlSum("value")} / count(*)) * (${sqlSum("value")} / count(*)), 0.0) + 1e-9) AS std
       |  FROM events GROUP BY 1
       |)
       |SELECT event_id, user_id, value,
       |       floor(((value - mean) / std) * 1e4 + 0.5) / 1e4 AS z
       |FROM events JOIN stats ON user_id = su
       |WHERE abs(floor(((value - mean) / std) * 1e4 + 0.5) / 1e4) > 3.0""".stripMargin

  /** #40 deterministic stratified sampling: per-stratum rates via the
    * portable md5 hash of the row id — reproducible across engines,
    * runs, and partitionings (the sine-qua-non of auditable pipeline
    * sampling; `TABLESAMPLE` is neither). Map-only, no shuffle. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 6), 16, 10)
        .cast("long") % 100
    val rate = when(col("lang") === "en", 10).otherwise(25)
    Tables.documents(s, dir)
      .filter(bucket < rate)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang, source, n_chars
      |FROM documents
      |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100
      |      < CASE WHEN lang = 'en' THEN 10 ELSE 25 END""".stripMargin

  /** #41 per-label embedding centroids, one row per (label, dim):
    * decimal-exact per-dimension means — the "class prototype" pass of
    * an embedding pipeline. posexplode is map-side; the shuffle carries
    * (label × dim) partial sums only. */
  def embCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("d"))
      .agg(davg(col("col").cast("double"), 6).as("mean_v"),
           count(lit(1)).as("n"))

  val embCentroidsSql: String =
    s"""SELECT label, d, ${sqlAvg("CAST(x AS DOUBLE)", 6)} AS mean_v, count(*) AS n
       |FROM (SELECT label, unnest(embedding) AS x,
       |             generate_subscripts(embedding, 1) AS d
       |      FROM embeddings)
       |GROUP BY 1, 2""".stripMargin

  /** #42 duplicate clustering: connected components over the n-gram
    * Jaccard near-dup graph by iterative min-label propagation — the
    * standard distributed CC (each round is one join+groupBy on the
    * edge key; rounds ≤ component diameter, tiny for dup clusters).
    * Convergence is detected from the (strictly decreasing) label sum —
    * one scalar collect per round, never the data. Singleton docs keep
    * their own id as cluster. */
  def dedupClusters(s: SparkSession, dir: String, tau: Double = 0.3): DataFrame =
    dedupClustersDf(Tables.documents(s, dir), tau)

  /** DataFrame-generic core: expects canonical (doc_id, text). */
  def dedupClustersDf(input: DataFrame, tau: Double = 0.3): DataFrame = {
    val pairs = TextOps.dedupNgramJaccardDf(input, tau)
      .select(col("id_a"), col("id_b"))
    val ed = pairs.union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = input.select(col("doc_id").as("id"), col("doc_id").as("lbl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var lblSum = cur.agg(sum(col("lbl"))).head.getLong(0)
    var done = false
    while (!done) {
      val nb = ed.join(cur.select(col("id").as("nid"), col("lbl").as("nlbl")),
          col("dst") === col("nid"))
        .groupBy(col("src")).agg(min(col("nlbl")).as("nb_lbl"))
      val next = cur.join(nb, cur("id") === nb("src"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nb_lbl"), col("lbl"))).as("lbl"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nextSum = next.agg(sum(col("lbl"))).head.getLong(0)
      cur.unpersist()
      cur = next
      done = nextSum == lblSum
      lblSum = nextSum
    }
    ed.unpersist()
    cur.select(col("id").as("doc_id"), col("lbl").as("cluster"))
  }

  /** DuckDB oracle for [[dedupClusters]]: min label over the recursive
    * transitive closure of the same edge set. */
  def dedupClustersSql(tau: Double = 0.3): String =
    s"""WITH RECURSIVE toks AS (
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
       |r(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT ed.dst, r.lbl FROM r JOIN ed ON ed.src = r.id
       |)
       |SELECT id AS doc_id, min(lbl) AS cluster FROM r GROUP BY 1""".stripMargin
}
