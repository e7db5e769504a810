package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps2

/** #369-#371 rich-vocabulary BPE: the batched trainer in its ≥1024-merge
  * design regime on COMMITTED data (the rich seam derives a wide
  * deterministic vocabulary from the driver tables — the raw text
  * exhausts at 89 merges). One memoized training run feeds all three
  * queries; these assertions pin the regime and the accounting
  * invariants of the curve/vocab readouts. */
class RichBpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  lazy val run: TextOps2.BatchedRun = TextOps2.richRun(spark, sf)

  test("rich training realizes >= 1024 merges on committed data") {
    assert(run.merges.size >= 1024,
      s"only ${run.merges.size} merges realized — below the design regime")
    // steps are sequential, rounds within schedule
    assert(run.merges.map(_._1) == (1 to run.merges.size))
    assert(run.merges.forall { case (_, r, _, _, _) => r >= 1 && r <= TextOps2.RichRounds })
  }

  test("compression curve: chars/occurrences merge-invariant, tokens " +
       "non-increasing, round 0 is pure chars") {
    val snaps = run.snaps.sortBy(_._1)
    assert(snaps.map(_._1) == TextOps2.RichGrid)
    val occ = snaps.map(_._3).distinct
    val chars = snaps.map(_._4).distinct
    assert(occ.size == 1, "word occurrences changed under merging")
    assert(chars.size == 1, "char mass changed under merging")
    val toks = snaps.map(_._5)
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      "token mass increased with merges")
    assert(snaps.head._5 == snaps.head._4, "round-0 tokens != chars")
    // merges-so-far strictly increases along the grid past round 0
    val ms = snaps.map(_._2)
    assert(ms.zip(ms.tail).forall { case (a, b) => b > a })
  }

  test("vocab rollup conserves the corpus char mass") {
    import org.apache.spark.sql.functions._
    val vocabChars = TextOps2.bpeVocabRich(spark, sf)
      .agg(sum(col("n_occurrences") * length(col("token")))).collect()(0).getLong(0)
    val snapChars = run.snaps.head._4
    assert(vocabChars == snapChars,
      s"vocab char mass $vocabChars != corpus char mass $snapChars")
    // and the regime shows in the vocabulary itself: >1024 merged symbols
    val merged = TextOps2.bpeVocabRich(spark, sf)
      .filter(col("is_merged")).count()
    assert(merged >= 512, s"only $merged merged symbols survive in the vocab")
  }
}
