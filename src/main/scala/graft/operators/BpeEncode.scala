package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.sources.Tables

/** #295 bpe_encode / #296 corpus_bpe_fertility — APPLYING the trained
  * tokenizer, closing the BPE chain: #112 counts one round's pairs,
  * #153 trains the merge table, these ENCODE the corpus with it and
  * re-base the token-economics views on REAL BPE counts instead of the
  * whitespace proxy (#77's budget and #163's fertility both count
  * ws-tokens; a tokenizer decision needs the counts the model will
  * actually see — Sennrich et al. 2016).
  *
  * Encoding runs over the WHOLE document string at once in the #153
  * boundary-delimited form (`|a|b| |c…`): every char becomes one
  * `|`-prefixed symbol, and fusing merge (a,b) IS
  * `replace('|a|b' → '|ab')` — left-to-right non-overlapping in both
  * engines, the exact greedy fuse rule #153 already pins. Spaces are
  * symbols too, and since training restricts the vocabulary to purely
  * alphabetic words, no merge can involve a space — so word boundaries
  * are respected with NO per-word explode: applying the k merges is k
  * literal string replaces per document, map-only. Real BPE token
  * count = symbols − spaces = count('|') − count(' ').
  *
  * The merge table is a driver-side model artifact (#153's collect —
  * bounded by contract), memoized per (session, dir, steps) so the
  * encode queries and the trainer share one training run per session.
  * Scale shape: training per round is a vocab-sized rollup + 1-row
  * collect; encoding is one map-only scan with k inlined literal
  * replaces (the ann_pq inlined-LUT discipline); the fertility readout
  * is a |langs|-key rollup of integer-exact sums. */
object BpeEncode {

  private val memo =
    new scala.collection.concurrent.TrieMap[(String, String, Int),
                                            Seq[(String, String)]]

  /** #153's trained merge table, in merge order, memoized. The trainer
    * enforces the fuse-boundary guard (no merge's right symbol is a
    * proper prefix of an earlier merged symbol — see
    * [[TextOps2.bpeTrainMerges]]), which is exactly the condition under
    * which applying these merges as whole-doc literal replaces is the
    * exact per-symbol greedy fuse (property-pinned in
    * SubstringPropertySpec). */
  private[graft] def trainedMerges(s: SparkSession, dir: String,
                                   steps: Int): Seq[(String, String)] =
    memo.getOrElseUpdate((s.sparkContext.applicationId, dir, steps),
      TextOps2.bpeTrainMerges(s, dir, steps).collect()
        .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Per-doc symbol table: normalized text, boundary encoding after all
    * merges, space count — shared by both readouts. DataFrame-generic
    * so the spec can pin the fuse rule on a hand-built merge table. */
  private[graft] def encodedDf(docs: DataFrame,
                               merges: Seq[(String, String)]): DataFrame = {
    val base = docs
      .withColumn("t", lower(trim(col("text"))))
      .withColumn("e", regexp_replace(col("t"), "(.)", "|$1"))
    val fused = merges.foldLeft(base) { case (df, (a, b)) =>
      df.withColumn("e", expr(s"replace(e, '|$a|$b', '|$a$b')"))
    }
    fused
      .withColumn("n_spaces", length(col("t")) - length(regexp_replace(col("t"), " ", "")))
      .withColumn("n_chars", length(col("t")) - col("n_spaces"))
      .withColumn("n_ws_tokens", size(split(col("t"), " ")).cast("long"))
      .withColumn("n_bpe_tokens",
        (length(col("e")) - length(regexp_replace(col("e"), "\\|", ""))
          - col("n_spaces")).cast("long"))
  }

  private def encoded(s: SparkSession, dir: String, steps: Int): DataFrame =
    encodedDf(Tables.documents(s, dir), trainedMerges(s, dir, steps))

  /** #295 bpe_encode: per-doc REAL BPE token counts under #153's merge
    * table, beside the ws proxy. n_chars − n_bpe_tokens = merge
    * applications in that doc (each fuse removes one symbol). */
  def bpeEncode(s: SparkSession, dir: String,
                steps: Int = TextOps2.BpeSteps): DataFrame =
    encoded(s, dir, steps)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
              col("n_ws_tokens"), col("n_bpe_tokens"),
              r(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 6)
                .as("bpe_per_word"))
      .orderBy(col("doc_id"))

  /** #296 corpus_bpe_fertility: #163's per-language fertility table
    * re-based on real BPE tokens, ws-proxy columns side by side — the
    * gap between chars_per_ws_token and chars_per_bpe_token is what
    * the proxy overstates per language. */
  def corpusBpeFertility(s: SparkSession, dir: String,
                         steps: Int = TextOps2.BpeSteps): DataFrame =
    encoded(s, dir, steps)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("n_chars"),
           sum(col("n_ws_tokens")).as("n_ws_tokens"),
           sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("n_chars"),
              col("n_ws_tokens"), col("n_bpe_tokens"),
              r(col("n_chars").cast("double") / col("n_ws_tokens"), 6)
                .as("chars_per_ws_token"),
              r(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)
                .as("chars_per_bpe_token"),
              r(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 6)
                .as("bpe_per_ws_token"))
      .orderBy(col("lang"))

  /** #298 corpus_token_budget_bpe: the #77 budget DECISION re-based on
    * real BPE tokens, proxy side by side. The budget a training run
    * actually has is model tokens; #77 approximates it in ws-tokens.
    * Per quality bucket (⌊q·100⌋, ≤101 rows): doc/ws/BPE masses,
    * cumulative-from-the-top totals, and TWO selections — `sel_real`
    * (cumulative real tokens fit the budget) vs `sel_proxy` (the same
    * budget converted to ws units by the corpus-level bpe/ws ratio,
    * #77's rule) — buckets where they disagree are the mass the proxy
    * mis-budgets. Same 100 TB shape as #77: one scan into bounded
    * registers, the window rides the ≤101-row table (the documented
    * partition-less exception), no global rank. */
  /** #298's MERGEABLE registers (doc count + ws/BPE token sums per
    * ⌊q·100⌋ bucket, ≤101 rows, all merge by addition) — also the #299
    * streaming state. The encode is map-only per arriving doc (the
    * merge table is a batch-trained literal, the #285 mid-day
    * discipline), so the register stream is one stateful aggregate. */
  private[graft] def budgetRegisters(docs: DataFrame,
                                     merges: Seq[(String, String)]): DataFrame =
    encodedDf(docs, merges)
      .select(floor(TextOps.qualityCol * 100).cast("long").as("qb"),
              col("n_ws_tokens").as("ws"), col("n_bpe_tokens").as("bpe"))
      .groupBy(col("qb"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("ws")).as("ws_tok"), sum(col("bpe")).as("bpe_tok"))

  /** #298/#299 readout over the drained ≤101-row register table: the
    * partition-less window rides a bounded input (the documented
    * exception), totals derive from the same registers. */
  private[graft] def budgetFinalize(budgetBpe: Long)(regs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = regs.agg(sum(col("ws_tok")).as("tot_ws"),
                          sum(col("bpe_tok")).as("tot_bpe"))
    val wDesc = Window.orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    regs
      .withColumn("cum_ws", sum(col("ws_tok")).over(wDesc))
      .withColumn("cum_bpe", sum(col("bpe_tok")).over(wDesc))
      .crossJoin(broadcast(totals))
      // proxy budget in ws units by the corpus ratio — integer div so
      // both engines land on the identical threshold
      .withColumn("sel_proxy",
        col("cum_ws") <= expr(s"($budgetBpe * tot_ws) div tot_bpe"))
      .withColumn("sel_real", col("cum_bpe") <= budgetBpe)
      .select(col("qb"), col("n_docs"), col("ws_tok"), col("bpe_tok"),
              col("cum_ws"), col("cum_bpe"), col("sel_proxy"), col("sel_real"))
      .orderBy(col("qb").desc)
  }

  def corpusTokenBudgetBpe(s: SparkSession, dir: String,
                           budgetBpe: Long = 100000,
                           steps: Int = TextOps2.BpeSteps): DataFrame =
    budgetFinalize(budgetBpe)(
      budgetRegisters(Tables.documents(s, dir), trainedMerges(s, dir, steps)))

  def corpusTokenBudgetBpeSql(budgetBpe: Long = 100000,
                              steps: Int = TextOps2.BpeSteps): String =
    s"""${encodedSql(steps)},
       |regs AS (
       |  SELECT CAST(floor((${TextOps.qualitySqlFrag}) * 100) AS BIGINT) AS qb,
       |         count(*) AS n_docs,
       |         CAST(sum(c.n_ws_tokens) AS BIGINT) AS ws_tok,
       |         CAST(sum(c.n_bpe_tokens) AS BIGINT) AS bpe_tok
       |  FROM counts c JOIN documents d ON c.doc_id = d.doc_id
       |  GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(ws_tok) AS BIGINT) AS tot_ws,
       |         CAST(sum(bpe_tok) AS BIGINT) AS tot_bpe
       |  FROM regs),
       |cum AS (
       |  SELECT qb, n_docs, ws_tok, bpe_tok,
       |         CAST(sum(ws_tok) OVER (ORDER BY qb DESC
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ws,
       |         CAST(sum(bpe_tok) OVER (ORDER BY qb DESC
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bpe
       |  FROM regs)
       |SELECT qb, n_docs, ws_tok, bpe_tok, cum_ws, cum_bpe,
       |       cum_ws <= ($budgetBpe * tot_ws) // tot_bpe AS sel_proxy,
       |       cum_bpe <= $budgetBpe AS sel_real
       |FROM cum CROSS JOIN tot ORDER BY qb DESC""".stripMargin

  /** Shared oracle prefix: #153's training CTE chain (verbatim replay)
    * + whole-doc boundary encode + the k replaces via win-k scalar
    * subqueries + per-doc counters. */
  private def encodedSql(steps: Int): String = {
    val train = TextOps2.bpeTrainMergesSql(steps)
      .linesIterator.toSeq
      .takeWhile(l => !l.startsWith("SELECT CAST(")) // keep CTEs, drop readout
      .mkString("\n")
      .stripSuffix("\n")
    val encChain = (1 to steps).map { k =>
      s"""enc$k AS (
         |  SELECT doc_id, lang, t,
         |         replace(e, '|' || (SELECT sym_a FROM win$k) || '|' || (SELECT sym_b FROM win$k),
         |                    '|' || (SELECT sym_a FROM win$k) || (SELECT sym_b FROM win$k)) AS e
         |  FROM enc${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""$train,
       |enc0 AS (
       |  SELECT doc_id, lang, lower(trim(text)) AS t,
       |         regexp_replace(lower(trim(text)), '(.)', '|\\1', 'g') AS e
       |  FROM documents),
       |$encChain,
       |counts AS (
       |  SELECT doc_id, lang,
       |         length(t) - length(replace(t, ' ', '')) AS n_spaces,
       |         length(replace(t, ' ', '')) AS n_chars,
       |         len(string_split(t, ' ')) AS n_ws_tokens,
       |         length(e) - length(replace(e, '|', ''))
       |           - (length(t) - length(replace(t, ' ', ''))) AS n_bpe_tokens
       |  FROM enc$steps)""".stripMargin
  }

  def bpeEncodeSql(steps: Int = TextOps2.BpeSteps): String =
    s"""${encodedSql(steps)}
       |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       |       CAST(n_ws_tokens AS BIGINT) AS n_ws_tokens,
       |       CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       |       ${sqlR("CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens", 6)} AS bpe_per_word
       |FROM counts ORDER BY doc_id""".stripMargin

  def corpusBpeFertilitySql(steps: Int = TextOps2.BpeSteps): String =
    s"""${encodedSql(steps)}
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |       CAST(sum(n_ws_tokens) AS BIGINT) AS n_ws_tokens,
       |       CAST(sum(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       |       ${sqlR("CAST(sum(n_chars) AS DOUBLE) / sum(n_ws_tokens)", 6)} AS chars_per_ws_token,
       |       ${sqlR("CAST(sum(n_chars) AS DOUBLE) / sum(n_bpe_tokens)", 6)} AS chars_per_bpe_token,
       |       ${sqlR("CAST(sum(n_bpe_tokens) AS DOUBLE) / sum(n_ws_tokens)", 6)} AS bpe_per_ws_token
       |FROM counts GROUP BY lang ORDER BY lang""".stripMargin
}
