package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** Round-6 batch-44 operators (SURVEY §2 #273): the Unicode script-mix
  * audit. (#272 stream_icc lives in [[graft.streaming.Streaming]] and
  * drains #271's per-user moment registers.)
  */
object Round6Ops27 {

  /** The audited scripts as (name, character-class regex) — explicit
    * ranges so both regex engines (Java, RE2) agree exactly. */
  private[graft] val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}]",
    "digit" -> "[0-9]")

  /** #273 text_script_mix: the UNICODE SCRIPT census — per source, the
    * mean character share of each major script (Latin, Cyrillic,
    * Arabic, CJK, digits) and how many docs are dominated (> 50%) by a
    * non-Latin script. The encoding-pipeline audit UNDER #23's
    * language ID: langid assumes the script survived ingestion —
    * double-encoded UTF-8, lost code pages and HTML-entity residue
    * shift the SCRIPT mix before any classifier runs, and a Latin-only
    * crawler suddenly emitting 3% Cyrillic is a routing bug this table
    * pages on (#222 catches per-doc garbage; this catches the
    * source-level drift).
    *
    * Scale shape: map-only regexp counts per script (fixed ×|scripts|
    * expression fan, no UDF), one source rollup — the #222
    * discipline. */
  def textScriptMix(s: SparkSession, dir: String): DataFrame =
    textScriptMixDf(Tables.documents(s, dir))

  /** The mergeable per-source script registers (doc count, decimal
    * ratio sums, dominance count) — the streaming state in
    * [[graft.streaming.Streaming.streamScriptMix]]. */
  def scriptRegisters(docs: DataFrame): DataFrame = {
    val len = greatest(length(col("text")).cast("double"), lit(1.0))
    def ratio(pat: String): Column =
      r(regexp_count(col("text"), lit(pat)) / len, 6)
    val nonLatin = Scripts.filter(p => p._1 != "latin" && p._1 != "digit")
    // r_nonlatin sums the ALREADY-computed rounded ratios (one regex
    // pass per script, not two) — bit-identical, half the regex cost
    // on the live per-doc path
    val scored = docs.select(
        col("source") +:
          Scripts.map { case (n0, pat) => ratio(pat).as(s"r_$n0") }: _*)
      .withColumn("r_nonlatin",
        nonLatin.map { case (n0, _) => col(s"r_$n0") }.reduce(_ + _))
    val aggs: Seq[Column] = count(lit(1)).as("n_docs") +:
      Scripts.map { case (n0, _) => dsum(col(s"r_$n0")).as(s"s_$n0") } :+
      sum(when(col("r_nonlatin") > 0.5, 1L).otherwise(0L))
        .as("n_nonlatin_dominant")
    scored.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
  }

  /** Mean readout over the ≤|sources| register table. */
  def scriptMixFinalize(g: DataFrame): DataFrame = {
    val means = Scripts.map { case (n0, _) =>
      r(col(s"s_$n0") / col("n_docs"), 6).as(s"mean_$n0")
    }
    g.select(Seq(col("source"), col("n_docs")) ++ means :+
        col("n_nonlatin_dominant"): _*)
      .orderBy(col("source"))
  }

  /** DataFrame-generic core: expects (source, text). */
  def textScriptMixDf(docs: DataFrame): DataFrame =
    scriptMixFinalize(scriptRegisters(docs))

  val textScriptMixSql: String = {
    val len = "greatest(CAST(length(text) AS DOUBLE), 1.0)"
    def ratio(pat: String) =
      sqlR(s"len(regexp_extract_all(text, '$pat')) / $len", 6)
    val rs = Scripts.map { case (n0, pat) => s"${ratio(pat)} AS r_$n0" }
    val nonLatin = Scripts.filter(p => p._1 != "latin" && p._1 != "digit")
      .map { case (n0, _) => s"r_$n0" }.mkString(" + ")
    val means = Scripts.map { case (n0, _) =>
      s"${sqlR(s"(${sqlSum(s"r_$n0")}) / count(*)", 6)} AS mean_$n0"
    }
    s"""WITH rs AS (
       |  SELECT source,
       |         ${rs.mkString(",\n         ")}
       |  FROM documents),
       |scored AS (
       |  SELECT *, $nonLatin AS r_nonlatin FROM rs)
       |SELECT source, count(*) AS n_docs,
       |       ${means.mkString(",\n       ")},
       |       CAST(sum(CASE WHEN r_nonlatin > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_nonlatin_dominant
       |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
