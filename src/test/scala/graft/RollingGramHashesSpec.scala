package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingGramHashes

/** Pins the native rolling-gram-hash expression against a plain-Scala
  * BigInt reference: the Mersenne mulmod folding, the power ladder, the
  * rolling update vs direct polynomial evaluation, and the k-floor. */
class RollingGramHashesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private val M = BigInt(RollingGramHashes.M)

  private def md5u60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Direct (non-rolling) BigInt polynomial — the independent oracle. */
  private def reference(toks: Seq[String], k: Int,
                        b: Long): Seq[Long] =
    if (toks.size < k) Seq.empty
    else (0 to toks.size - k).map { i =>
      (0 until k).foldLeft(BigInt(0)) { (acc, j) =>
        (acc + BigInt(md5u60(toks(i + j))) * BigInt(b).modPow(k - 1 - j, M)) % M
      }.toLong
    }

  test("mulmod/powmod match BigInt over adversarial operands") {
    val vals = Seq(0L, 1L, 2L, RollingGramHashes.M - 1, RollingGramHashes.M - 2,
      (1L << 60) - 1, (1L << 59) + 12345, 999999937L)
    for (a <- vals; b <- vals) {
      val exp = (BigInt(a) * BigInt(b) % M).toLong
      assert(RollingGramHashes.mulmod(a, b) == exp, s"mulmod($a, $b)")
    }
    for (e <- Seq(0, 1, 2, 19, 63))
      assert(RollingGramHashes.powmod(RollingGramHashes.B1, e) ==
        BigInt(RollingGramHashes.B1).modPow(e, M).toLong)
  }

  test("expression output equals the direct BigInt polynomial on 25 seeded docs") {
    val rnd = new scala.util.Random(11)
    val words = Vector("the", "a", "cat", "sat", "mat", "dog", "ran", "far")
    for (trial <- 1 to 25) {
      val k = 2 + rnd.nextInt(4)
      val n = rnd.nextInt(12) // includes below-floor docs
      val toks = Seq.fill(n)(words(rnd.nextInt(words.size)))
      val got = Seq(Tuple1(toks)).toDF("w")
        .selectExpr(s"rolling_gram_hashes(w, $k) AS g")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
      val exp = reference(toks, k, RollingGramHashes.B1)
        .zip(reference(toks, k, RollingGramHashes.B2))
      assert(got == exp, s"trial $trial k=$k toks=$toks")
    }
  }

  test("gram-equality semantics match the old md5-gram convention") {
    // two docs sharing a 20-token run at different offsets: the span
    // report must be identical to an md5-keyed replay
    val shared = (1 to 25).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared tail one two"),
      (2L, s"alpha beta gamma $shared"),
      (3L, "nothing in common here at all with anything else repeated never " +
           "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12")
    ).toDF("doc_id", "text")
    val out = graft.operators.SubstringDedup.dedupSubstringDf(docs, k = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    // md5-replay: mark positions whose 20-gram string occurs in ≥2 docs
    val toksBy = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.split(" ").toSeq)
      .toMap
    val gramsBy = toksBy.view.mapValues { w =>
      if (w.size < 20) Seq.empty
      else (0 to w.size - 20).map(i => (i, w.slice(i, i + 20).mkString(" ")))
    }.toMap
    val df = gramsBy.toSeq.flatMap { case (id, gs) => gs.map(g => (g._2, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    for ((id, gs) <- gramsBy) {
      val marked = gs.filter(g => df(g._2) >= 2).map(_._1)
      if (marked.isEmpty) assert(!out.contains(id))
      else {
        // interval union of [p, p+19]
        val covered = marked.flatMap(p => p to p + 19).distinct.size.toLong
        assert(out(id).getAs[Long]("dup_tokens") == covered, s"doc $id")
      }
    }
  }
}
