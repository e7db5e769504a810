package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops20

/** Round-9 batch-20 operators (#346-#347). */
class Round9Ops20Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("stream_style_divergence: register stream ≡ batch, bit for bit") {
    val batch = graft.operators.Round9Ops18
      .docStyleDivergence(spark, sf).collect().toSeq
    val live = graft.streaming.Streaming.streamStyleDivergence(spark, sf)
      .collect().toSeq
    assert(live == batch)
  }

  // Two 4-cliques joined by a single bridge edge: LPA finds the two
  // blocks; each block's cut is the 2 bridge arcs... (1 arc per
  // direction, one with ca in each block) -> cut_arcs 1 per community,
  // vol 13 arcs (4*3 intra + 1 bridge), conductance 1/13.
  test("graph_conductance: two bridged cliques read as tight blocks") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val e = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)) ++
      Seq((4L, 11L))).toDF("src", "dst")
    val out = Round9Ops20.conductanceDf(e, 4).collect()
    assert(out.length == 2, "two communities")
    out.foreach { r =>
      assert(r.getLong(1) == 4, "each block has its 4 members")
      assert(r.getLong(3) == 1, "exactly the bridge arc leaks")
      assert(math.abs(r.getDouble(4) - 1.0 / 13) < 1e-6)
    }
  }

  test("graph_conductance: corpus run — bounded, consistent with the partition") {
    val out = Round9Ops20.graphConductance(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "cut is a subset of volume")
      if (!r.isNullAt(4)) {
        val phi = r.getDouble(4)
        assert(phi >= 0.0, "conductance non-negative")
      }
    }
    // node inventory matches the modularity partition (same LPA rounds)
    val nModularity = graft.operators.Round9Ops4.graphModularity(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(out.map(_.getLong(1)).sum == nModularity)
  }
}
