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
