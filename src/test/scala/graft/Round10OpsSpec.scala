package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeEncode, Round10Ops, TextOps2}

/** Round-10 operators (#356-#357): CDC chunk dedup and the BPE
  * vocabulary artifact. */
class Round10OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("cdc chunks: widths partition every doc; insertion re-aligns shared chunks") {
    // doc 2 = a 10-token insertion + doc 1's 600-token body: every
    // chunk boundary inside the body is content-defined, so the shared
    // chunks re-align despite the offset — the property a fixed grid
    // (#24i) lacks by construction
    val body = words("r", 600)
    val docs = Seq(
      (1L, "web", body.mkString(" ")),
      (2L, "web", (words("ins", 10) ++ body).mkString(" ")),
      (3L, "api", words("q", 200).mkString(" "))
    ).toDF("doc_id", "source", "text")
    val out = Round10Ops.cdcChunksDf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // chunks partition the corpus: per-source token sums are exact
    assert(out("web").getLong(2) == 600L + 610L)
    assert(out("api").getLong(2) == 200L)
    // the body re-aligns: a large share of the 600 shared tokens sits
    // in duplicated chunks (only the chunks touching the insertion and
    // the pre-first-cut prefix can differ)
    val dupTok = out("web").getAs[Long]("dup_tokens")
    assert(dupTok >= 600L, s"expected most of the shared body deduped, got $dupTok")
    assert(out("api").getAs[Long]("n_dup_chunks") == 0L)
    // mean width is the rollup identity
    val w = out("web")
    assert(w.getAs[Double]("mean_chunk_tokens") ==
      math.floor(w.getLong(2).toDouble / w.getLong(1) * 1e6 + 0.5) / 1e6)
  }

  test("cdc chunks: single unique doc has zero dup mass; short doc is one chunk") {
    val docs = Seq((1L, "s", words("only", 30).mkString(" ")),
                   (2L, "s", "tiny doc here")).toDF("doc_id", "source", "text")
    val out = Round10Ops.cdcChunksDf(docs).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("dup_tokens") == 0L)
    assert(out(0).getAs[Long]("n_tokens") == 33L)
  }

  test("compression curve: token mass non-increasing in merges, chars invariant") {
    val rows = Round10Ops.bpeCompressionCurve(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Round10Ops.CurveGrid)
    val toks = rows.map(_.getLong(3))
    assert(toks.sliding(2).forall { case Array(a, b) => b <= a },
      s"more merges must never add tokens: ${toks.toSeq}")
    assert(toks.last < toks.head, "64 merges must compress at sf0.001")
    // char mass and word occurrences are merge-invariant identities
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    assert(rows.map(_.getLong(2)).distinct.length == 1)
    // at 0 merges every char is a token
    assert(rows.head.getLong(3) == rows.head.getLong(2))
    // chars_per_token rises monotonically with merges
    val cpt = rows.map(_.getDouble(5))
    assert(cpt.sliding(2).forall { case Array(a, b) => b >= a - 1e-9 })
  }

  test("bpe_vocab: merged tokens come from the merge table; compression monotone") {
    val vocab = Round10Ops.bpeVocab(spark, sf).collect()
    assert(vocab.nonEmpty)
    val merges = BpeEncode.trainedMerges(spark, sf, TextOps2.BpeSteps)
    val mergedSyms = merges.map { case (a, b) => a + b }.toSet
    vocab.foreach { r =>
      assert(r.getLong(1) > 0, s"dead vocab row ${r.getString(0)}")
      if (r.getBoolean(2))
        assert(mergedSyms.contains(r.getString(0)),
          s"merged token ${r.getString(0)} not produced by any merge")
      else assert(r.getString(0).length == 1)
    }
    // total symbol mass shrinks as merges apply (each fuse removes one)
    val t0 = Round10Ops.bpeVocab(spark, sf, steps = 0)
      .agg(org.apache.spark.sql.functions.sum("n_occurrences"))
      .collect()(0).getLong(0)
    val t64 = vocab.map(_.getLong(1)).sum
    assert(t64 < t0, s"64 merges must fuse something: $t64 vs $t0")
  }
}
