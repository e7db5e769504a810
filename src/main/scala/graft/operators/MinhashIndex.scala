package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Staging, Tables}

/** #368 dedup_minhash_index_probe: the PERSISTED MinHash signature
  * artifact — the [[AnnIndex]] build-once/probe-many treatment applied
  * to the dedup side of the house. The daily-crawl story (#282) runs
  * near-dup checks every day against a mostly-unchanged corpus; the
  * expensive stage is the SIGNATURE JOB (shingle explode, one md5 + k
  * affine re-hashes per shingle, a k-wide min fold — proportional to
  * total shingle volume, i.e. to corpus bytes), and it is identical
  * every day the corpus doesn't change. The build stages one parquet
  * artifact:
  *
  *   - `sigs/` — (doc_id, m0..m{k−1}): the k-component signature per
  *     document. Longs round-trip parquet exactly, so every consumer
  *     is bit-identical to the in-session path.
  *
  * KEYED BY k ONLY (not by banding): band keys are a map-only
  * projection of the min columns ([[LshDedup.bandCandidates]]), so the
  * banding (bands × rows) is a probe-time choice — ONE signature
  * artifact serves every point of the #169 band curve and any τ. The
  * probe derives band keys in-plan from the persisted mins, buckets,
  * pairs under the `maxBucket` skew cap, and verifies candidates with
  * the exact shingle-set Jaccard against the shingle table re-read
  * from primary storage (candidate-bounded — the artifact deliberately
  * stores signatures, not shingle sets; same discipline as the PQ
  * index's re-rank fetch).
  *
  * Freshness: [[Staging]] source stamp against `documents.parquet` —
  * a fresh artifact runs ZERO signature jobs (spec-pinned: no min-fold
  * aggregate anywhere in the probe plan); a regenerated corpus
  * re-stages. Result ≡ [[LshDedup.dedupMinhash]] bit-for-bit, so the
  * probe SHARES ITS ORACLE.
  */
object MinhashIndex {

  /** Artifact root for (dir, k): tmp-dir keyed by a path hash (the
    * Evolution convention) + the signature width. */
  private[graft] def indexPath(dir: String, k: Int): String = {
    val pathHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_mhix_${pathHash}_k$k"
  }

  /** Build (idempotent): run the signature job once, persist the
    * k-wide signature table, stamp against the source. A fresh
    * artifact short-circuits — no shingle scan, no signature job. */
  def build(s: SparkSession, dir: String, k: Int = 64): String = {
    val base = indexPath(dir, k)
    val src = s"$dir/documents.parquet"
    if (!Staging.isFresh(s"$base/sigs", src)) {
      val docs = TextOps.shingleTable(Tables.documents(s, dir))
        .filter(size(col("sh")) > 0)
      LshDedup.signatureTable(docs, k)
        .write.mode(SaveMode.Overwrite).parquet(s"$base/sigs")
      Staging.markStaged(s"$base/sigs", src)
    }
    base
  }

  /** #368 dedup_minhash_index_probe: near-dup pairs FROM THE ARTIFACT —
    * read the persisted signatures, derive band keys in-plan (map-only),
    * bucket + pair under the skew cap, then the shared exact-Jaccard
    * verify over the candidate-bounded shingle fetch. Bit-identical to
    * [[LshDedup.dedupMinhash]] at the same (τ, k, bands, maxBucket). */
  def probe(s: SparkSession, dir: String, tau: Double = 0.3, k: Int = 64,
            bands: Int = 32, maxBucket: Int = 256): DataFrame = {
    val base = build(s, dir, k)
    val sigs = s.read.parquet(s"$base/sigs")
    val candidates = LshDedup.bandCandidates(sigs, k, bands, maxBucket)
    val docs = TextOps.shingleTable(Tables.documents(s, dir))
      .filter(size(col("sh")) > 0)
    LshDedup.verifyPairs(candidates, docs, tau)
  }
}
