package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents pipeline. Everything
  * is a Catalyst expression (split/regexp/higher-order functions) — no
  * UDFs, so whole-stage codegen covers the hot path and the same logic is
  * expressible as oracle SQL.
  */
object TextFunctions {

  /** Whitespace tokens of the raw text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Lowercased single-space tokens (shingling / stopword basis). */
  def lowerTokens(text: Column): Column = split(lower(trim(text)), " ")

  /** Whitespace-collapsed, lowercased normal form. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** md5 fingerprint of the normal form. */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "is", "in")

  /** Count of tokens that belong to `words` (higher-order filter —
    * codegen'd, no shuffle). */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => x.isin(words: _*)))

  /** Language marker profiles (standard stopword-profile heuristic). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> stopwordsEn,
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "es" -> Seq("el", "la", "de", "los", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un"))

  /** Word 3-gram shingles (distinct), empty below 3 tokens. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
                  element_at(toks, i + 2)))))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
}
