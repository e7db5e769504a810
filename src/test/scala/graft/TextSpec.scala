package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def markersOf(s: String): Map[String, Int] = {
    val toks = lowerTokens(lit(s))
    Seq("en", "de", "es", "fr")
      .map(l => l -> markerCount(toks, langMarkers(l)))
      .foldLeft(spark.range(1).toDF()) { case (df, (l, c)) => df.withColumn(l, c) }
      .collect().head.getValuesMap[Int](Seq("en", "de", "es", "fr"))
  }

  test("langid markers fire on real phrases") {
    val en = markersOf("the quick brown fox jumps over the lazy dog and runs to the hills")
    assert(en("en") > en("de") && en("en") > en("es") && en("en") > en("fr"))
    val de = markersOf("der hund und die katze sind nicht das problem")
    assert(de("de") > de("en"))
    val fr = markersOf("le chat et les chiens mangent des croquettes dans un jardin")
    assert(fr("fr") > fr("en"))
  }

  test("shingles3: distinct 3-gram shingles; empty below 3 tokens") {
    val df = Seq("a b c d", "a b", "x y z x y z x y z").toDF("text")
      .select(shingles3(lowerTokens(col("text"))).as("sh"))
    val out = df.collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
    // 7 raw shingles but only 3 distinct rotations
    assert(out(2).toSet == Set("x y z", "y z x", "z x y"))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq("Hello  World", "hello world", "hello  world!").toDF("text")
      .select(fingerprint(col("text")).as("f"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  private val sf = "/root/testdata/sf0.001"

  test("pii redact: masks emails and phones, counts them, preserves the rest") {
    // injected-PII contract: every doc gains at least one email and one
    // phone, both counted; then the same patterns on crafted literals.
    val rows = graft.operators.TextOps.textPiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1, "injected email must be counted")   // n_emails
      assert(r.getInt(2) >= 1, "injected phone must be counted")   // n_phones
      assert(r.getInt(3) > 0)                                      // redacted_len
    }
    // direct regex behaviour on literals (same patterns the op compiles)
    val red = Seq("write to a.b+c@mail.example.org or call +44 20 7946 0958 now")
      .toDF("t")
      .select(
        regexp_count(col("t"), lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).as("ne"),
        regexp_replace(
          regexp_replace(col("t"), "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
          "\\+[0-9][0-9 ]{7,}[0-9]", "<PHONE>").as("r"))
      .collect().head
    assert(red.getInt(0) == 1)
    assert(red.getString(1) == "write to <EMAIL> or call <PHONE> now")
  }

  test("lm score: log-probs negative, bigram counts consistent with token counts") {
    val lm = graft.operators.TextOps.textLmScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(lm.nonEmpty)
    lm.values.foreach { case (nBi, avgLp) =>
      assert(nBi >= 1)
      // Laplace-smoothed P(b|a) < 1 strictly (V >= 1, so denominator
      // exceeds any numerator) => every log-prob is negative
      assert(avgLp < 0.0)
    }
    // a doc with >= 2 tokens has exactly n_tokens - 1 bigrams
    val toks = graft.operators.TextOps.textTokens(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    lm.foreach { case (id, (nBi, _)) => assert(nBi == toks(id) - 1) }
    // docs with < 2 tokens are absent, never zero-row artifacts
    assert(lm.keySet.subsetOf(toks.filter(_._2 >= 2).keySet))
  }

  test("token entropy: uniform text maxes, repeated text zeroes, bounds hold") {
    val rows = graft.operators.TextOps.textTokenEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nd) = (r.getLong(1), r.getLong(2))
      val (ent, norm) = (r.getDouble(3), r.getDouble(4))
      assert(n >= nd && nd >= 1)
      assert(ent >= 0.0, s"entropy must be non-negative, got $ent")
      // entropy <= ln(n_distinct) (+6dp rounding slack)
      assert(ent <= math.log(nd.toDouble) + 1e-5)
      assert(norm >= 0.0 && norm <= 1.0 + 1e-5)
      if (nd == 1) assert(ent == 0.0 && norm == 0.0)
    }
  }

  test("text_repetition: top-token fraction and distinct ratio bounds") {
    val rows = graft.operators.TextOps.textRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nDis, topN) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (topFrac, disRatio) = (r.getDouble(4), r.getDouble(5))
      assert(topN >= 1 && topN <= nTok)
      assert(nDis >= 1 && nDis <= nTok)
      // the most common token accounts for at least 1/n_distinct of mass
      // (top_frac is rounded to 6dp by the operator, so allow a half-ulp
      // of that rounding: 1/11 = 0.09090909… rounds DOWN to 0.090909)
      assert(topFrac >= 1.0 / nDis - 5e-7 && topFrac <= 1.0)
      assert(disRatio > 0.0 && disRatio <= 1.0)
    }
  }

  test("dedup_incremental: agrees with exact dedup on the full corpus") {
    val inc = graft.operators.TextOps.dedupIncremental(spark, sf).collect()
    val delta = inc.map(_.getLong(0)).toSet
    assert(delta.nonEmpty && delta.forall(_ % 5 == 0))
    // a delta doc maps to a base doc iff the full-corpus dedup groups them
    val groups = graft.operators.TextOps.dedupExact(spark, sf)
      .filter(col("n_dups") > 1).collect().map(_.getString(0)).toSet
    inc.foreach { r =>
      if (!r.isNullAt(2)) {
        assert(r.getLong(2) % 5 != 0)            // dup_of is a base doc
        assert(groups.contains(r.getString(1)))  // and the fp really collides
      }
    }
  }

  test("text_contamination: shared counts bounded by shingle sets") {
    val rows = graft.operators.TextOps.textContamination(spark, sf).collect()
    rows.foreach { r =>
      val (n, shared, frac) = (r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(shared >= 1 && shared <= n)
      assert(frac > 0.0 && frac <= 1.0)
    }
  }
}
