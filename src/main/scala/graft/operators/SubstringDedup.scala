package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions.lowerTokens
import graft.sources.Tables

/** #294 dedup_substring — EXACT substring deduplication, the production
  * stage between exact-document dedup (#25) and MinHash near-dup (#27)
  * in an LLM curation pipeline (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better" — their ExactSubstr:
  * a span repeated verbatim across documents is memorization fuel even
  * when the documents as wholes are unrelated).
  *
  * Semantics: a token position is DUPLICATED when its k-token gram
  * (k = 20, matching #24i's passage width) appears verbatim in at
  * least one OTHER document. The per-doc report merges the duplicated
  * positions' covered intervals [off, off+k-1] into maximal spans
  * (interval union — a token is removable iff ≥1 cross-doc duplicated
  * gram covers it) and counts removable tokens. Unlike #24i
  * text_passage_dedup, whose fixed 20-token chunk grid only sees
  * repeats ALIGNED to chunk boundaries, the rolling gram index catches
  * repeats at ARBITRARY offsets — a span straddling a chunk boundary
  * is invisible to #24i and found here (pinned by SubstringDedupSpec).
  *
  * Spark-first plan, no pair join anywhere: the reference formulation
  * (suffix array over the concatenated corpus) is a global sort-heavy
  * structure; the relational equivalent is
  *   1. map-only rolling gram table (doc_id, off, h) — one explode per
  *      doc, O(tokens) rows;
  *   2. gram-frequency rollup `groupBy(h) → countDistinct(doc_id) ≥ 2`
  *      — partial-aggregated, no postings self-join (this is where
  *      #26's DF-cap concern dissolves: marking positions needs only
  *      each gram's doc-frequency, never the df² pair expansion, so
  *      corpus-common grams cost one counter, not a quadratic join);
  *   3. shuffle join grams→dup-hashes on h (dup set is unbounded — a
  *      boilerplate-heavy corpus can mark most positions — so no
  *      broadcast, same reasoning as #24i);
  *   4. per-doc interval merge: one window (partitionBy doc_id), state
  *      bounded by doc length — the gaps-and-islands break fires when
  *      the next duplicated offset starts beyond the previous gram's
  *      last covered token (gap > k−1), i.e. true interval union, not
  *      mere offset adjacency (offsets i and i+2 overlap in tokens for
  *      any k ≥ 3 and must merge).
  * Gram key = full md5 hex (128-bit): exact for any realistic corpus;
  * a 32-bit truncation would false-positive at ~2^16 distinct grams.
  * At 100 TB the dominant cost is the map-side O(n·k) gram hashing —
  * a native rolling-hash expression (the [[graft.functions.WinnowFps]]
  * pattern with offsets) drops it to O(n) without changing the plan.
  */
object SubstringDedup {

  /** Rolling k-token gram md5s of a token-array column; empty below the
    * k-token floor (sequence(1,0) would DESCEND — the winnow guard). */
  private def gramHashes(w: Column, k: Int): Column =
    when(size(w) >= k,
      transform(sequence(lit(1), size(w) - (k - 1)),
        i => md5(concat_ws(" ", slice(w, i, lit(k))).cast("binary"))))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))

  /** DataFrame-generic core: expects canonical (doc_id, text). */
  def dedupSubstringDf(docs: DataFrame, k: Int = 20): DataFrame = {
    val toks = docs.select(col("doc_id"), lowerTokens(col("text")).as("w"))
    val grams = toks
      .select(col("doc_id"), posexplode(gramHashes(col("w"), k)).as(Seq("pos", "h")))
    val dup = grams.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("h"))
    val marked = grams.join(dup, "h").select(col("doc_id"), col("pos"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = marked
      .withColumn("prev", lag(col("pos"), 1).over(byPos))
      // interval-union break: the previous gram covers tokens up to
      // prev+k-1; a new span starts only past that
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + lit(k - 1), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("brk"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"),
           count(lit(1)).as("npos"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(sum(col("npos")).as("n_dup_grams"),
           count(lit(1)).as("n_spans"),
           sum(col("e") - col("s") + lit(k)).as("dup_tokens"))
    perDoc
      .join(toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens")),
            "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_dup_grams"),
              col("n_spans"), col("dup_tokens"),
              r(col("dup_tokens").cast("double") / col("n_tokens"), 6)
                .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  def dedupSubstring(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    dedupSubstringDf(Tables.documents(s, dir), k)

  /** Oracle: CTE replay of the same index → mark → interval-merge →
    * per-doc rollup (DuckDB lateral via unnest(range), same md5 keys,
    * same gap > k−1 break). */
  def dedupSubstringSql(k: Int = 20): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, CAST(i AS INT) AS pos,
       |         md5(array_to_string(w[CAST(i AS INT):CAST(i + ${k - 1} AS INT)], ' ')) AS h
       |  FROM toks, unnest(range(1, greatest(len(w) - ${k - 2}, 1))) t(i)),
       |dup AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |marked AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
       |brks AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + ${k - 1}
       |              THEN 1 ELSE 0 END AS brk
       |  FROM marked),
       |grps AS (
       |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM brks),
       |spans AS (
       |  SELECT doc_id, grp, min(pos) AS s, max(pos) AS e, count(*) AS npos
       |  FROM grps GROUP BY 1, 2),
       |per_doc AS (
       |  SELECT doc_id, CAST(sum(npos) AS BIGINT) AS n_dup_grams,
       |         count(*) AS n_spans,
       |         CAST(sum(e - s + $k) AS BIGINT) AS dup_tokens
       |  FROM spans GROUP BY 1)
       |SELECT p.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens, p.n_dup_grams,
       |       p.n_spans, p.dup_tokens,
       |       ${sqlR(s"p.dup_tokens / CAST(len(t.w) AS DOUBLE)", 6)} AS dup_frac
       |FROM per_doc p JOIN toks t USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
}
