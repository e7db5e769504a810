package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.operators.{LshDedup, Similarity, TextOps}

/** Recall/precision pins for the probabilistic operators against their
  * exact counterparts. Everything is xxhash64-seeded → fully
  * deterministic: these are exact regression values, not flaky
  * statistical bounds. */
class LshSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dedup_minhash: precision 1 vs exact Jaccard; J>=0.5 pairs always found") {
    val exact = TextOps.dedupNgramJaccard(spark, sf)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val mh = LshDedup.dedupMinhash(spark, sf)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision 1: every minhash pair is an exact pair with identical J
    mh.foreach { case (k, j) => assert(exact.get(k).contains(j)) }
    // the LSH s-curve guarantees J>=0.5 pairs at 32 bands x 2 rows
    exact.filter(_._2 >= 0.5).keys.foreach(k => assert(mh.contains(k)))
  }

  test("dedup_minhash: bucket cap keeps a near-duplicate-saturated corpus " +
       "linear while preserving cluster connectivity") {
    // Adversarial corpus: 600 clones of one document (tiny per-doc noise
    // via a shared prefix keeps shingle sets overwhelmingly overlapping)
    // — every band bucket of every clone collapses onto the same key.
    // All-pairs would emit 600·599/2 = 179 700 candidates per bucket;
    // the cap must keep output pairs LINEAR in corpus size while the
    // verified pairs still connect all clones into one component.
    val n = 600
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (0 until n).map(i => (i.toLong, s"$body extra$i"))
      .toDF("doc_id", "text")
    val cap = 64
    val pairs = LshDedup.dedupMinhashDf(docs, tau = 0.3, maxBucket = cap)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // linear, not quadratic: chain pairing emits ≤ (n−1) distinct
    // successor edges per saturated bucket family — far under all-pairs
    assert(pairs.length < 4 * n, s"${pairs.length} pairs — cap did not engage")
    assert(pairs.nonEmpty)
    // connectivity: union-find over the verified pairs → one component
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    val roots = (0 until n).map(find).distinct
    assert(roots.size == 1, s"${roots.size} components — connectivity lost under the cap")
    // and the cap leaves an UNsaturated corpus bit-identical: pairs from
    // the capped run at default size == pairs with the cap effectively off
    val uncapped = LshDedup.dedupMinhashDf(docs, tau = 0.3, maxBucket = n + 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.toSet.subsetOf(uncapped),
      "capped output must be a subset of the all-pairs output")
  }

  test("dedup_simhash: identical docs collide at hamming 0; near-identical close") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a.replace("dog", "cat")
    val bits = Seq(a, a, b).toDF("text")
      .select(LshDedup.simhashBits(lowerTokens(col("text"))).as("bits"))
      .collect().map(_.getSeq[Int](0))
    assert(bits(0) == bits(1))
    val hamAB = bits(0).zip(bits(2)).count { case (x, y) => x != y }
    assert(hamAB > 0 && hamAB <= 16) // one word changed → few bits flip
  }

  test("ann_lsh: deterministic recall vs brute force on its worst case (uniform vectors)") {
    val brute = Similarity.knnBrute(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall=$recall") // uniform-random is LSH's floor
    assert(ann.size <= brute.size)
  }

  test("ann_ivf: deterministic k-means cells, recall vs brute with nProbe=4/16") {
    val brute = Similarity.knnBrute(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall") // deterministic: 22/25 on this corpus
  }

  test("emb_pca: recovers the dominant axis; unit loading; Rayleigh eigenvalue = axis variance") {
    // variance only along dim 2 → C = diag(0, var, 0...), the power
    // iteration collapses onto e₂ after one round; λ = population var
    val vals = Seq(1.0f, 3.0f, 5.0f, 7.0f) // mean 4, pop var 5
    val df = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Array(2.0f, v, 0f, 0f, 0f, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val res = Similarity.embPcaDf(df).collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Double]("loading"), r.getAs[Double]("eigenvalue"))).toMap
    assert(math.abs(math.abs(res(2)._1) - 1.0) < 1e-7)
    (Seq(1, 3, 4, 5, 6, 7, 8)).foreach(d => assert(math.abs(res(d)._1) < 1e-7))
    assert(math.abs(res(2)._2 - 5.0) < 1e-5)
    // loadings form a unit vector
    val norm2 = res.values.map(_._1).map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-6)
  }

  test("knn_graph: high recall on clustered vectors; ranks strictly ordered") {
    // three tight clusters of 10 (64-dim, one dominant axis each ±small
    // deterministic jitter) — nearest neighbours live inside the
    // cluster, which is LSH's favourable case
    val rows = for {
      c <- 0 until 3
      m <- 0 until 10
    } yield {
      val arr = Array.fill(64)(0.0f)
      arr(c * 3) = 1.0f
      arr((c * 3 + 1) % 64) = 0.05f * ((m % 5) - 2)
      ((c * 10 + m).toLong, arr)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val g = Similarity.knnGraphDf(emb, k = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank")))
    // every edge stays within the source's cluster (cross-cluster cosine
    // is ~0, within-cluster ~1) and ranks are 1..m with non-increasing
    // cosine per source
    assert(g.nonEmpty)
    g.foreach { case (q, v, _, _) => assert(q / 10 == v / 10) }
    g.groupBy(_._1).foreach { case (_, edges) =>
      val sorted = edges.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse == sorted.map(_._3).toSeq)
    }
    // recall vs the exact graph: clustered vectors bucket together
    val brute = Similarity.knnBruteDf(emb,
        emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), k = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val edges = g.map(e => (e._1, e._2)).toSet
    val recall = (edges & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("emb_dedup_cosine: exact-verified subset of exhaustive pairs; near-dup recall ~1") {
    // LSH-candidate pairs are a SUBSET of the exhaustive all-pairs form
    // with identical exact cosines (precision 1 by construction)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val exact = Similarity.embDedupCosineExactDf(emb)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.embDedupCosineDf(emb)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    lsh.foreach { case (k, c) => assert(exact.get(k).contains(c)) }
    // τ=0.35 on uniform random vectors is LSH's WORST case (pairs sit at
    // the decision boundary, collision prob ≈ 0.6^6/table); deterministic
    // md5 planes → this is a regression pin, not a statistical bound
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"worst-case recall=$recall (${lsh.size}/${exact.size})")
    // genuinely near-duplicate pairs (the operator's actual target) are
    // caught essentially always: three tight clusters, within-cluster
    // cosine ≥ 0.99, labels = cluster
    val rows = for { c <- 0 until 3; m <- 0 until 10 } yield {
      val arr = Array.fill(64)(0.0f)
      arr(c * 3) = 1.0f
      arr((c * 3 + 1) % 64) = 0.05f * ((m % 5) - 2)
      ((c * 10 + m).toLong, arr, s"label$c")
    }
    val clustered = rows.toDF("vec_id", "embedding", "label")
    val exactC = Similarity.embDedupCosineExactDf(clustered, tau = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val lshC = Similarity.embDedupCosineDf(clustered, tau = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(exactC.nonEmpty)
    val recallC = (lshC & exactC).size.toDouble / exactC.size
    assert(recallC >= 0.95, s"near-dup recall=$recallC")
  }

  test("emb_semantic_dedup: keep-first pruning rule holds exactly; cluster minima kept") {
    val out = Similarity.embSemanticDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out.length == emb.size) // every vector present exactly once
    // brute-force mirror of the rule: dropped iff ANY lower-id vector
    // in the same cluster has rounded cosine >= tau
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (_, members) =>
      val sorted = members.sortBy(_._1)
      assert(sorted.head._3, "lowest id in a cluster must always be kept")
      sorted.foreach { case (id, _, kept) =>
        val expectDrop = sorted.exists { case (id2, _, _) =>
          id2 < id && cos(emb(id), emb(id2)) >= 0.3
        }
        assert(kept == !expectDrop, s"vec $id kept=$kept expectedDrop=$expectDrop")
      }
    }
    // the rule actually fires on this corpus (some drop, most kept)
    val dropped = out.count(!_._3)
    assert(dropped > 0 && dropped < out.length / 2, s"dropped=$dropped")
  }

  test("corpus_curate_semantic: gate + gated keep-first rule hold exactly") {
    val out = Similarity.corpusCurateSemantic(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"),
                 r.getAs[Long]("cluster"), r.getAs[Boolean]("kept")))
    assert(out.nonEmpty)
    // (1) every emitted doc passes the gate
    out.foreach { case (_, q, _, _) => assert(q >= 0.5) }
    // (2) the gate actually excludes documents
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(out.length < nDocs)
    // (3) pruning is keep-first AMONG GATED docs only: a doc whose only
    // near-dup was gated out must be kept
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    out.groupBy(_._3).foreach { case (_, members) =>
      val sorted = members.sortBy(_._1)
      assert(sorted.head._4, "lowest gated id in a cluster must be kept")
      sorted.foreach { case (id, _, _, kept) =>
        val expectDrop = sorted.exists { case (id2, _, _, _) =>
          id2 < id && cos(emb(id), emb(id2)) >= 0.3
        }
        assert(kept == !expectDrop, s"doc $id kept=$kept expectedDrop=$expectDrop")
      }
    }
    // (4) gating rescues docs the ungated pass would drop: kept here ⊇
    // (kept by emb_semantic_dedup ∩ gated)
    val fullKept = Similarity.embSemanticDedup(spark, sf).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val gatedIds = out.map(_._1).toSet
    val keptHere = out.filter(_._4).map(_._1).toSet
    assert((fullKept & gatedIds).subsetOf(keptHere))
  }

  test("minhash signature: permutation-min monotonicity (superset has <= minima)") {
    val df = Seq(
      (1L, Seq("a b c", "b c d")),
      (2L, Seq("a b c", "b c d", "c d e"))).toDF("id", "sh")
      .select($"id", LshDedup.minhashSignature($"sh", 16).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs(1L).zip(sigs(2L)).foreach { case (s1, s2) => assert(s2 <= s1) }
  }
}
