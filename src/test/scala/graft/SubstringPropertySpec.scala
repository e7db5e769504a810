package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeEncode, SubstringDedup}

/** Oracle-independent brute-force pins for the round-9 operators: the
  * distributed results must equal a plain-Scala reference on seeded
  * random corpora (deterministic — exact regression values, not flaky
  * statistical bounds). */
class SubstringPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  /** Plain-Scala reference for #294: per doc, cross-doc duplicated
    * k-gram positions → union of covered token intervals → (dup grams,
    * spans = connected components, covered tokens). */
  private def brute(docs: Map[Long, Vector[String]], k: Int)
      : Map[Long, (Long, Long, Long)] = {
    val grams = docs.toSeq.flatMap { case (id, w) =>
      if (w.size >= k) (0 to w.size - k).map(i => (w.slice(i, i + k).mkString(" "), id))
      else Nil
    }
    val docsByGram = grams.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    docs.flatMap { case (id, w) =>
      val marked = if (w.size < k) Seq.empty
        else (0 to w.size - k).filter { i =>
          (docsByGram(w.slice(i, i + k).mkString(" ")) - id).nonEmpty
        }
      if (marked.isEmpty) None
      else {
        val covered = marked.flatMap(i => i until i + k).toSet
        val spans = covered.toSeq.sorted
          .foldLeft((0L, Int.MinValue)) { case ((n, prev), t) =>
            (if (t == prev + 1) n else n + 1, t)
          }._1
        Some(id -> (marked.size.toLong, spans, covered.size.toLong))
      }
    }
  }

  test("dedup_substring equals the brute-force reference on 25 seeded corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val k = 2 + rnd.nextInt(3) // 2..4
      val n = 3 + rnd.nextInt(4) // 3..6 docs
      val docs = (1L to n).map { id =>
        id -> Vector.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
      }.toMap
      val df = docs.toSeq.map { case (id, w) => (id, w.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = SubstringDedup.dedupSubstringDf(df, k).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val exp = brute(docs, k)
      assert(got == exp, s"trial $trial (k=$k): $got vs $exp\ndocs=$docs")
    }
  }

  /** Plain-Scala reference for #295's fuse rule: per word, apply each
    * merge in order, greedy left-to-right non-overlapping. */
  private def bruteEncode(words: Seq[String],
                          merges: Seq[(String, String)]): Long =
    words.map { w =>
      var syms = w.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.size.toLong
    }.sum

  test("bpe_encode token counts equal per-word greedy fusion on 25 seeded corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 25) {
      val nm = 1 + rnd.nextInt(3)
      // arbitrary single-char pairs, then stacked merges with the first
      // merged symbol on the LEFT and on the RIGHT — the bracketed
      // per-symbol encoding ('|a||b|' → '|ab|') is collision-free for
      // ANY merge table, so the generator no longer avoids right-symbol
      // prefix overlaps (the old single-delimiter guard condition).
      val base = Seq.fill(nm)((vocab(rnd.nextInt(8)), vocab(rnd.nextInt(8))))
        .distinct
      val m0 = base.head._1 + base.head._2
      val merges = base ++
        Seq((m0, vocab(rnd.nextInt(8))), (vocab(rnd.nextInt(8)), m0))
      val docs = (1L to 3L).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(8))(
          (1 to (1 + rnd.nextInt(6))).map(_ => vocab(rnd.nextInt(8))).mkString)
      }
      val df = docs.map { case (id, ws) => (id, "en", ws.mkString(" ")) }
        .toDF("doc_id", "lang", "text")
      val got = BpeEncode.encodedDf(df, merges)
        .select("doc_id", "n_bpe_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = docs.map { case (id, ws) => id -> bruteEncode(ws, merges) }.toMap
      assert(got == exp, s"trial $trial: $got vs $exp\nmerges=$merges docs=$docs")
    }
  }
}
