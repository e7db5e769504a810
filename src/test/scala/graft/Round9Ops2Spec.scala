package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Round9Ops2

/** Round-9 batch-2 operators (#302-#305): LPA communities, seed-hop
  * curation distance, diff-in-differences, and the in-engine logistic
  * quality classifier. Hand-simulated fixtures pin the iterative
  * semantics; sf0.001 runs pin the corpus-level contracts.
  */
class Round9Ops2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  // Two triangles {1,2,3} and {4,5,6} joined by the single bridge 3-4.
  // Hand-simulated synchronous majority LPA (tie -> min label):
  //   r1: [2,1,1,3,4,4]  r2: [1,1,1,4,3,3]  r3: [1,1,1,3,3,3]
  //   r4: [1,1,1,3,3,3]  (stable)
  // LPA must cut at the bridge; min-label connected components (#42's
  // semantics) would coalesce all six nodes into one.
  test("graph_label_propagation: bridge between two triangles splits into two communities") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
                    (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = Round9Ops2.labelPropDf(edges, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
                            (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L)))
  }

  test("graph_label_propagation: corpus run covers exactly the non-isolate nodes") {
    val out = Round9Ops2.graphLabelProp(spark, sf).collect()
    val und = graft.operators.Similarity.knnGraph(spark, sf)
      .select(col("q_id").as("id"))
      .union(graft.operators.Similarity.knnGraph(spark, sf).select(col("vec_id")))
      .distinct().count()
    assert(out.length.toLong == und, "one row per node with at least one edge")
    val nComm = out.map(_.getLong(1)).distinct.length
    assert(nComm > 1 && nComm < out.length,
      "communities coarser than nodes, finer than one blob")
    // sizes are consistent with membership counts
    val sizes = out.groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.length }
    out.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1))))
  }

  // Path 1-2-3-4-5 plus isolate 6, seed {1}, maxHops 3:
  // dists 0,1,2,3 along the path; 5 and 6 unreachable -> -1.
  test("graph_seed_distance: BFS hops along a path, -1 beyond the horizon") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val nodes = (1L to 6L).toDF("vec_id")
    val out = Round9Ops2.seedDistanceDf(edges, seeds, nodes, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3), (5L, -1), (6L, -1)))
  }

  test("graph_seed_distance: corpus seeds sit at hop 0, everything within the horizon") {
    val out = Round9Ops2.graphSeedDistance(spark, sf).collect()
    val seeds = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("label") === 0).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    out.foreach { r =>
      val (id, h) = (r.getLong(0), r.getInt(1))
      if (seeds(id)) assert(h == 0, s"seed $id must be hop 0")
      assert(h >= -1 && h <= 3)
    }
    assert(out.count(_.getInt(1) > 0) > 0, "some non-seed is reached")
  }

  test("events_diff_in_diff: estimate is the difference of arm deltas; cells are populated") {
    val out = Round9Ops2.eventsDiffInDiff(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq(1, 2, 3, 4).foreach(i => assert(r.getLong(i) >= 2, "cell sizes >= 2"))
      val did = (r.getDouble(8) - r.getDouble(7)) - (r.getDouble(6) - r.getDouble(5))
      assert(math.abs(r.getDouble(9) - did) < 3e-6,
        "did recomposes from the four cell means up to edge rounding")
      assert(r.getDouble(10) > 0, "pooled se is positive")
      assert(!r.isNullAt(11), "t_stat present when se > 0")
    }
  }

  test("corpus_quality_classifier: GD loss decreases; intercept moves to the base-rate logit") {
    val x = Round9Ops2.classifierFeatures(
      graft.sources.Tables.documents(spark, sf))
    val rows = x.collect().map(r =>
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    def loss(w: Array[Double]): Double = {
      val ls = rows.map { case (y, x1, x2, x3) =>
        val z = r6(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3)
        val p = math.min(1 - 1e-9, math.max(1e-9, r6(1.0 / (1.0 + math.exp(-z)))))
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }
      ls.sum / ls.length
    }
    val hist = Round9Ops2.trainWeights(x, 8, 0.5)
    assert(hist.length == 9)
    val losses = hist.map(loss)
    losses.sliding(2).foreach { case Seq(a, b) => assert(b < a, "loss strictly decreases") }
    val ybar = rows.map(_._1).sum / rows.length
    val target = math.log(ybar / (1 - ybar))
    assert(math.abs(hist.last(0) - target) < math.abs(target),
      "intercept strictly closer to the base-rate logit than the zero init")
    // standardized features: zero mean to rounding tolerance
    Seq(rows.map(_._2), rows.map(_._3), rows.map(_._4)).foreach { f =>
      assert(math.abs(f.sum / f.length) < 1e-3)
    }
    // scored output: probabilities in (0,1), pred thresholds at 0.5
    val out = Round9Ops2.corpusQualityClassifier(spark, sf).collect()
    assert(out.length == rows.length)
    out.foreach { r =>
      val sc = r.getDouble(4)
      assert(sc > 0.0 && sc < 1.0)
      assert(r.getInt(5) == (if (sc >= 0.5) 1 else 0))
    }
  }
}
