package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Round9Ops3, Round9Ops5}

/** Round-9 batch-5 operators (#314-#315). */
class Round9Ops5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // Two triangles {1,2,3},{4,5,6} + bridge 3-4: every triangle edge has
  // exactly one common neighbor; the bridge has none.
  test("graph_local_bridges: the bridge edge is the only zero-embedded one") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
                    (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = Round9Ops5.localBridgesDf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, false), (1L, 3L, 1L, false), (2L, 3L, 1L, false),
      (3L, 4L, 0L, true),
      (4L, 5L, 1L, false), (4L, 6L, 1L, false), (5L, 6L, 1L, false)))
  }

  test("graph_local_bridges: corpus run — one row per undirected edge, flag consistent") {
    val out = Round9Ops5.graphLocalBridges(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "edges oriented src < dst")
      assert(r.getBoolean(3) == (r.getLong(2) == 0L))
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length == out.length)
  }

  test("corpus_keyphrase_index: totals reconcile with the per-doc RAKE table") {
    val idx = Round9Ops5.corpusKeyphraseIndex(spark, sf).collect()
    assert(idx.nonEmpty && idx.length <= 20)
    // descending by total score, phrase tiebreak
    idx.sliding(2).foreach { case Array(a, b) =>
      val (ta, tb) = (a.getDouble(3), b.getDouble(3))
      assert(ta > tb || (ta == tb && a.getString(0) < b.getString(0)))
    case _ => ()
    }
    // spot-check the top phrase against the raw per-occurrence table
    val top = idx.head
    val occs = Round9Ops3.rakePhraseScores(
        graft.sources.Tables.documents(spark, sf)).collect()
      .filter(_.getString(3) == top.getString(0))
    assert(occs.length.toLong == top.getLong(2), "occurrence count reconciles")
    assert(occs.map(_.getLong(0)).distinct.length.toLong == top.getLong(1),
      "doc count reconciles")
  }
}
