package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeEncode

/** #295/#296 pins: the whole-doc fuse rule on a hand-built merge table,
  * count identities, and monotone compression as merges accumulate. */
class BpeEncodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hand-built merges: word-level fuse matches per-word greedy BPE") {
    val docs = Seq((1L, "en", "abc ab x"), (2L, "en", "ba ab abab"))
      .toDF("doc_id", "lang", "text")
    val merges = Seq(("a", "b"), ("ab", "c"))
    // the vocab-level map: each DISTINCT word fused once
    val wmap = BpeEncode.wordTokenMap(docs, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // abc: |a||b||c| -> |ab||c| -> |abc|; ba has no (a,b) adjacency;
    // abab fuses twice (left-to-right non-overlapping), never to abc
    assert(wmap == Map("abc" -> 1L, "ab" -> 1L, "x" -> 1L,
                       "ba" -> 2L, "abab" -> 2L))
    val rows = BpeEncode.encodedDf(docs, merges)
      .select("doc_id", "n_chars", "n_ws_tokens", "n_bpe_tokens")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(3) == 3L)
    assert(rows(2L).getLong(3) == 5L)
    assert(rows(1L).getLong(2) == 3L && rows(2L).getLong(2) == 3L)
  }

  test("stacked right-symbol merges fuse correctly (the bracketed-encoding case)") {
    // merge 3 has a MERGED symbol on the RIGHT — the single-delimiter
    // encoding's collision case: pattern |x|ab would false-match |x|abc.
    val docs = Seq((1L, "en", "xab xabc ab")).toDF("doc_id", "lang", "text")
    val merges = Seq(("a", "b"), ("ab", "c"), ("x", "ab"))
    val wmap = BpeEncode.wordTokenMap(docs, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // xab: |x||ab| -> |xab| (1); xabc: |x||ab||c| -> |x||abc| (2 — the
    // (ab,c) fuse happens FIRST in merge order, so (x,ab) no longer
    // matches); ab -> 1
    assert(wmap == Map("xab" -> 1L, "xabc" -> 2L, "ab" -> 1L))
  }

  test("count identities on real data: chars bound bpe bound ws") {
    val enc = BpeEncode.bpeEncode(spark, sf).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (chars, ws, bpe) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bpe <= chars, "a merge can only shrink the symbol count")
      assert(bpe >= ws, "every word is at least one token")
    }
  }

  test("compression is monotone in the number of applied merges") {
    val totals = (0 to 3).map { k =>
      BpeEncode.bpeEncode(spark, sf, steps = k)
        .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"))
        .collect()(0).getLong(0)
    }
    assert(totals.sliding(2).forall { case Seq(a, b) => b <= a },
      s"more merges must never add tokens: $totals")
    assert(totals.last < totals.head, "3 merges must fuse something at sf0.001")
  }

  test("token budget on real tokens: prefix selections, real fits budget") {
    val budget = 20000L
    val rows = BpeEncode.corpusTokenBudgetBpe(spark, sf, budgetBpe = budget)
      .collect() // already qb-descending
    assert(rows.nonEmpty)
    def prefixThenOff(sel: Array[Boolean]): Boolean =
      sel.zip(sel.tail).forall { case (a, b) => a || !b } // no false->true
    assert(prefixThenOff(rows.map(_.getBoolean(7))), "sel_real is a top prefix")
    assert(prefixThenOff(rows.map(_.getBoolean(6))), "sel_proxy is a top prefix")
    val realMass = rows.filter(_.getBoolean(7)).map(_.getLong(3)).sum
    assert(realMass <= budget, "selected real-token mass fits the budget")
    // whole-bucket semantics: adding the first rejected bucket overflows
    val firstOut = rows.find(!_.getBoolean(7))
    firstOut.foreach(r => assert(realMass + r.getLong(3) > budget))
  }

  test("stream_token_budget_bpe is bit-identical to the batch decision table") {
    val batch = BpeEncode.corpusTokenBudgetBpe(spark, sf).collect().toSeq
    val streamed = graft.streaming.Streaming.streamTokenBudgetBpe(spark, sf)
      .collect().toSeq
    assert(streamed == batch, "drained register readout diverged from batch")
  }

  test("fertility rollup reconciles with the per-doc encode") {
    val perDoc = BpeEncode.bpeEncode(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"),
           org.apache.spark.sql.functions.sum("n_ws_tokens"))
      .collect()(0)
    val fert = BpeEncode.corpusBpeFertility(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"),
           org.apache.spark.sql.functions.sum("n_ws_tokens"))
      .collect()(0)
    assert(perDoc.getLong(0) == fert.getLong(0))
    assert(perDoc.getLong(1) == fert.getLong(1))
  }
}
