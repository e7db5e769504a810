package graft

import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.streaming.TestGroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{KmvIn, KmvSketchRow, KnnIn, KnnPair, KnnTopRow, Streaming, StreamingKnn}

/** Pure-fold properties for the O(k) streaming state transitions: the
  * final state must be a function of the SET of rows seen, invariant to
  * how the stream chunked them into micro-batches and to arrival order
  * within a batch — the law that makes the drained stream sketches
  * bit-identical to their batch builds. No SparkSession needed: the
  * folds run against TestGroupState exactly as the state store drives
  * them. */
class FoldPropertySpec extends AnyFunSuite {

  private def gs[S](state: Option[S]): TestGroupState[S] =
    TestGroupState.create[S](
      org.apache.spark.api.java.Optional.fromNullable(state.getOrElse(null.asInstanceOf[S])),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), false)

  test("foldKmv: final sketch = k smallest distinct hashes, for any chunking and order") {
    val rng = new scala.util.Random(11)
    val k = 8
    (0 until 50).foreach { trial =>
      val hashes = Seq.fill(20 + rng.nextInt(100))(rng.nextInt(40).toLong)
      val expected = hashes.distinct.sorted.take(k)
      val nChunks = 1 + rng.nextInt(5)
      val shuffled = rng.shuffle(hashes)
      val bounds = (0 +: Seq.fill(nChunks - 1)(rng.nextInt(shuffled.size + 1)).sorted) :+ shuffled.size
      var state: Option[KmvSketchRow] = None
      bounds.zip(bounds.tail).foreach { case (a, b) =>
        val g = gs(state)
        Streaming.foldKmv(k)("t", shuffled.slice(a, b).iterator.map(KmvIn("t", _)), g)
        state = if (g.exists) Some(g.get) else None
      }
      assert(state.get.ks == expected, s"trial $trial")
    }
  }

  test("foldKnn: final shortlist = k best (hamming, vec_id) pairs, for any chunking and order") {
    val rng = new scala.util.Random(13)
    val k = 5
    (0 until 50).foreach { trial =>
      val cands = Seq.fill(10 + rng.nextInt(80))(
        KnnIn(0L, rng.nextInt(1000).toLong, rng.nextInt(65)))
      val expected = cands.map(c => KnnPair(c.hamming, c.vec_id))
        .distinct.sortBy(p => (p.hamming, p.vec_id)).take(k)
      val shuffled = rng.shuffle(cands)
      val nChunks = 1 + rng.nextInt(5)
      val bounds = (0 +: Seq.fill(nChunks - 1)(rng.nextInt(shuffled.size + 1)).sorted) :+ shuffled.size
      var state: Option[KnnTopRow] = None
      bounds.zip(bounds.tail).foreach { case (a, b) =>
        val g = gs(state)
        StreamingKnn.foldKnn(k)(0L, shuffled.slice(a, b).iterator, g)
        state = if (g.exists) Some(g.get) else None
      }
      assert(state.get.top == expected, s"trial $trial")
    }
  }
}
