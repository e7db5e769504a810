package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps2

/** #364 bpe_train_batched: the batched trainer's selection rule, its
  * per-round disjointness contract, agreement with the sequential
  * trainer where they must agree, and the VOCABULARY-SCALING proof the
  * driver corpus cannot host (its documents draw from a 30-word
  * dictionary — a 107-merge ceiling — so the ≥1024-merge regime is
  * exercised here over a synthetic 2000-word vocabulary). */
class BpeBatchedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("selectBatch: shadowing rule — skipped pairs still shadow their symbols") {
    val pool = Seq(("t", "h", 50L), ("h", "e", 40L), ("e", "r", 30L),
                   ("a", "n", 25L), ("i", "n", 20L), ("o", "u", 10L))
    // (h,e) blocked by t-h's h; (e,r) blocked by the SKIPPED (h,e)'s e;
    // (i,n) blocked by (a,n)'s n — the DuckDB NOT-EXISTS twin returns
    // exactly this (checked by the shared oracle)
    assert(TextOps2.selectBatch(pool, 3) ==
      Seq(("t", "h", 50L), ("a", "n", 25L), ("o", "u", 10L)))
    assert(TextOps2.selectBatch(pool, 1) == Seq(("t", "h", 50L)))
  }

  test("batched trainer on the corpus: first merge = sequential winner; " +
       "every round's batch is symbol-disjoint; exhaustion is graceful") {
    val batched = TextOps2.bpeTrainBatched(spark, sf).collect()
    val seqFirst = TextOps2.bpeTrainMerges(spark, sf, steps = 1).collect()(0)
    assert(batched(0).getString(2) == seqFirst.getString(1))
    assert(batched(0).getString(3) == seqFirst.getString(2))
    assert(batched(0).getLong(4) == seqFirst.getLong(3))
    // per-round disjointness: no symbol belongs to two PAIRS of one
    // round (a self-pair like (g,g) legitimately repeats its own symbol)
    batched.groupBy(_.getInt(1)).foreach { case (round, rows) =>
      val owners = rows.zipWithIndex.flatMap { case (r, i) =>
        Set(r.getString(2), r.getString(3)).map(_ -> i)
      }
      owners.groupBy(_._1).foreach { case (sym, os) =>
        assert(os.map(_._2).distinct.length == 1,
          s"round $round: symbol $sym is in ${os.length} pairs")
      }
    }
    // steps are 1..n dense and ordered by (round, rank)
    assert(batched.map(_.getInt(0)).toSeq == (1 to batched.length))
    assert(batched.map(_.getInt(1)).toSeq == batched.map(_.getInt(1)).sorted.toSeq)
    // the 30-word corpus exhausts: more merges than the sequential-64
    // table, bounded by the Σ(len−1)=107 dictionary ceiling
    assert(batched.length > 64 && batched.length <= 107, s"${batched.length}")
  }

  test("vocabulary scaling: >1024 merges from a 2000-word vocabulary in " +
       "~100 rounds — per-merge cost is the batch amortization, not a round") {
    // deterministic synthetic vocabulary: 2000 distinct 8-char words
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val words = (0 until 2000).map { i =>
      val h = i * 2654435761L + 97
      (0 until 8).map(j => alpha(((h >> (j * 7)) % 26).toInt.abs)).mkString
    }.distinct
    assert(words.length > 1900)
    // weight words unevenly so pair counts have structure
    val docs = words.zipWithIndex
      .map { case (w, i) => Seq.fill(i % 7 + 1)(w).mkString(" ") }
      .grouped(50).map(_.mkString(" ")).toSeq
      .toDF("text")
    val merges = TextOps2.bpeTrainBatchedDf(docs, rounds = 110, k = 16).collect()
    val nRounds = merges.map(_.getInt(1)).distinct.length
    assert(merges.length >= 1024,
      s"only ${merges.length} merges from ${nRounds} rounds")
    assert(merges.length.toDouble / nRounds >= 8.0,
      s"batching is not amortizing: ${merges.length} merges / $nRounds rounds")
  }
}
