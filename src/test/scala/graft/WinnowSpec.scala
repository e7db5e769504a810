package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The native WinnowFps expression must be value-identical to the
  * column-expression (lambda) formulation it replaced. */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val fast = TextOps.textWinnowFpDf(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = TextOps.textWinnowFpColumns(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (fast, ref)
  }

  test("winnow_fps equals the column formulation on the test corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val (fast, ref) = both(docs)
    assert(fast == ref)
    assert(fast.nonEmpty)
  }

  test("winnow_fps edge cases: short, boundary, repetitive, unicode") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      "",                         // empty
      "short",                    // below k
      "x" * 22,                   // k+w-2: one short of a window
      "x" * 23,                   // exactly k+w-1: one window
      "x" * 100,                  // degenerate repetition (1 distinct gram)
      "ab" * 40,                  // period-2 repetition
      "héllo wörld ünïcode " * 5, // multibyte chars (code-point substr)
      rnd.alphanumeric.take(500).mkString,
      ("the quick brown fox " * 10).trim)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (fast, ref) = both(df)
    assert(fast == ref)
    // a doc of one repeated char has exactly one distinct fingerprint
    assert(fast.count(_._1 == 4) == 1)
  }

  test("winnow_fps per-row array equals the lambda array (order included)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50).select(col("doc_id"), graft.functions.TextFunctions.normalize(col("text")).as("t"))
    graft.functions.GraftFunctions.ensure(spark)
    val n = length(col("t"))
    val grams = transform(sequence(lit(1), n - 7), i =>
      conv(substring(md5(col("t").substr(i, lit(8)).cast("binary")), 1, 8), 16, 10)
        .cast("long"))
    val minima = transform(sequence(lit(1), size(col("hs")) - 15), j =>
      array_min(slice(col("hs"), j, lit(16))))
    val ref = docs
      .withColumn("hs", when(n >= 23, grams).otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
      .select(col("doc_id"),
        when(size(col("hs")) >= 16, array_distinct(minima))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")).as("fp"))
    val fast = docs.select(col("doc_id"),
      call_function("winnow_fps", col("t"), lit(8), lit(16)).as("fp"))
    val a = ref.orderBy("doc_id").collect().map(_.getSeq[Long](1).toList).toList
    val b = fast.orderBy("doc_id").collect().map(_.getSeq[Long](1).toList).toList
    assert(a == b)
  }
}
