package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries2
import graft.streaming.{EwmaIn, EwmaState, StreamingEwma}

/** Streaming EWMA: exact batch ↔ stream parity (the fold replays the
  * batch window expression bit-for-bit) and in-order chunking
  * invariance of the stateful fold. */
class StreamingEwmaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  private val sf = "/root/testdata/sf0.001"

  private def foldChunks(chunks: Seq[Seq[EwmaIn]]): (Seq[graft.streaming.EwmaOut], Option[EwmaState]) = {
    var state: Option[EwmaState] = None
    val out = Seq.newBuilder[graft.streaming.EwmaOut]
    chunks.foreach { chunk =>
      val gs = TestGroupState.create[EwmaState](
        org.apache.spark.api.java.Optional.fromNullable(state.orNull),
        GroupStateTimeout.NoTimeout, 0L,
        org.apache.spark.api.java.Optional.empty[Long](), false)
      out ++= StreamingEwma.foldEwma(1L, chunk.iterator, gs)
      state = if (gs.exists) Some(gs.get) else None
    }
    (out.result(), state)
  }

  test("foldEwma: emission is invariant to in-order chunking (property)") {
    val rng = new scala.util.Random(7)
    (0 until 30).foreach { trial =>
      val n = 5 + rng.nextInt(60)
      val events = Seq.tabulate(n)(i =>
        EwmaIn(i.toLong, 1L, i.toLong * 1000000,
               if (rng.nextInt(10) == 0) None
               else Some(rng.nextDouble() * 100 - 50)))
      val (oneShot, _) = foldChunks(Seq(events))
      val nChunks = 2 + rng.nextInt(4)
      val bounds = (0 +: Seq.fill(nChunks - 1)(rng.nextInt(n + 1)).sorted) :+ n
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => events.slice(a, b) }
      val (multi, _) = foldChunks(chunks)
      assert(multi == oneShot, s"trial $trial: emissions diverge under chunking")
    }
  }

  test("foldEwma: state window is bounded at K-1 regardless of history") {
    val events = Seq.tabulate(500)(i => EwmaIn(i.toLong, 1L, i.toLong, Some(i.toDouble)))
    val (_, state) = foldChunks(Seq(events))
    assert(state.get.window.length == StreamingEwma.K - 1)
  }

  test("stream run equals the batch window operator row-for-row (exact)") {
    val batch = TimeSeries2.tsEwma(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val stream = StreamingEwma.streamEwma(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(stream.size == batch.size)
    val diffs = batch.collect { case (id, b) if stream(id) != b => id }
    assert(diffs.isEmpty, s"${diffs.size} rows differ, e.g. ${diffs.take(5)}")
  }
}
