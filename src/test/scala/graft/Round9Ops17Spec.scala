package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mhw, Round9Ops17}

/** Round-9 batch-17 operators (#340-#341). */
class Round9Ops17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  test("emb_label_noise: rates bounded, checked set matches the graph's probes") {
    val out = Round9Ops17.embLabelNoise(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "suspects are a subset")
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val checked = out.map(_.getLong(1)).sum
    val probes = graft.operators.Similarity.knnGraph(spark, sf, 3)
      .select("q_id").distinct().count()
    assert(checked == probes, "every non-isolate vector is audited exactly once")
  }

  // Two tight clusters around opposite corners of the embedding space,
  // labels = cluster, one deliberately flipped label: noise detection
  // flags exactly the flip.
  test("emb_label_noise: a planted flipped label is the only suspect") {
    import spark.implicits._
    val rng = new java.util.Random(9)
    def vec(base: Float) =
      Array.fill(64)(base + 0.05f * rng.nextGaussian().toFloat)
    val emb = ((0L until 12L).map(i => (i, vec(1.0f), 0)) ++
               (12L until 24L).map(i => (i, vec(-1.0f), 1)) ++
               Seq((24L, vec(1.0f), 1))) // lives in cluster 0, labeled 1
      .toDF("vec_id", "embedding", "label")
    val out = Round9Ops17.embLabelNoiseDf(emb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0)._2 == 0, "cluster-0 labels all clean")
    assert(out(1)._2 == 1, "exactly the flipped vector is suspect")
  }

  test("mhw_event_sync: pair table is consistent with the severity chain") {
    import org.apache.spark.sql.functions._
    val out = Mhw.mhwEventSync(spark, sf).collect()
    assert(out.nonEmpty, "some series co-experience events")
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical pair order")
      val (da, db, both) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both >= 1 && both <= math.min(da, db))
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
      assert(math.abs(j - both.toDouble / (da + db - both)) < 1e-6)
    }
    // day counts agree with the chain's own event-day tally
    val evDays = Mhw.severityChain(spark, sf, 0.9)
      .filter(col("severity") > 1)
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(evDays(r.getLong(0)) == r.getLong(2))
      assert(evDays(r.getLong(1)) == r.getLong(3))
    }
  }

  // Series 1 and 2 share all 3 event days (jaccard 1); series 3 shares
  // one of its 3 days with each (jaccard 1/5); series 4 never co-occurs
  // and must be absent from the pair table.
  test("mhw_event_sync: hand event-day sets score the exact jaccards") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val evd = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (2L, "2024-01-02"), (2L, "2024-01-03"),
      (3L, "2024-01-03"), (3L, "2024-02-01"), (3L, "2024-02-02"),
      (4L, "2024-03-01")
    ).toDF("user_id", "ds").select($"user_id", to_date($"ds").as("d"))
    val out = Mhw.eventSyncDf(evd).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "non-co-occurring series absent")
    assert(out((1L, 2L)) == (3L, 1.0))
    assert(out((1L, 3L)) == (1L, 0.2))
    assert(out((2L, 3L)) == (1L, 0.2))
  }
}
