package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops18

/** Round-9 batch-18 operators (#342-#343). */
class Round9Ops18Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("stream_robust_center: register stream ≡ batch, bit for bit") {
    val batch = graft.operators.Round9Ops15
      .eventsRobustCenter(spark, sf).collect().toSeq
    val live = graft.streaming.Streaming.streamRobustCenter(spark, sf)
      .collect().toSeq
    assert(live == batch)
  }

  // Identical sources diverge by 0; disjoint alphabets diverge by ln 2
  // exactly (each side's mixture share is p/2 -> sum p ln 2).
  test("doc_style_divergence: identical 0, disjoint alphabets ln 2") {
    import spark.implicits._
    val docs = Seq(
      ("web", "abcabc"), ("web", "cba"),
      ("webtwin", "abcabc"), ("webtwin", "cba"),
      ("digits", "123123"), ("digits", "321")
    ).toDF("source", "text")
    val out = Round9Ops18.styleDivergenceDf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val (twinJs, twinNorm) = out(("web", "webtwin"))
    assert(twinJs == 0.0 && twinNorm == 0.0)
    val (djJs, djNorm) = out(("digits", "web"))
    assert(math.abs(djJs - math.log(2.0)) < 1e-4, s"disjoint js=$djJs")
    assert(math.abs(djNorm - 1.0) < 1e-4)
  }

  test("doc_style_divergence: corpus run — full pair grid, js in [0, ln 2]") {
    val out = Round9Ops18.docStyleDivergence(spark, sf).collect()
    val nSrc = graft.sources.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(out.length == nSrc * (nSrc - 1) / 2, "one row per source pair")
    out.foreach { r =>
      val js = r.getDouble(2)
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-6)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-6)
      assert(r.getString(4) != null)
    }
  }
}
