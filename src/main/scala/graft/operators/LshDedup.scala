package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Probabilistic near-duplicate detection over `documents`
  * (SURVEY §2 D27-D28). Both operators follow the classic
  * sketch → band-bucket → candidate-join → exact-verify shape: the pair
  * space is never materialized, bucket joins bound the candidates, and
  * every emitted pair is exactly verified — so precision is 1 and only
  * recall is probabilistic (pinned by LshDedupSpec against the exact
  * n-gram Jaccard operator).
  *
  * All hashing is `xxhash64` (seeded, deterministic across runs/JVMs/
  * partitionings) built from codegen'd higher-order functions — no UDFs.
  */
object LshDedup {

  // ------------------------------------------------------------- MinHash

  /** MinHash signature: sig[i] = min over shingles of xxhash64(i, s).
    * (Array-lambda form — kept for the spec's algebraic property test;
    * the operator below uses the columnar min-aggregate form, which is
    * ~30× faster: plain codegen'd min aggs, no per-row array churn.) */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** #27 MinHash+LSH dedup: k=64 hashes, 32 bands × 2 rows. Band keys
    * bucket-join candidates; exact Jaccard (on the full shingle sets)
    * verifies. LSH s-curve: P(candidate) = 1−(1−J²)³², ≈1 at J≥0.5,
    * ≈0.23 at J=0.3 — τ defaults to 0.3 so the spec can measure recall
    * in the probabilistic region while J≥0.5 pairs are near-certain.
    *
    * Shape: explode shingles once, k hash columns, one partial-agg
    * groupBy(doc) of k mins (map-side combine — the shuffle carries one
    * k-wide row per doc per partition), then band keys from the min
    * columns. */
  def dedupMinhash(s: SparkSession, dir: String, tau: Double = 0.3,
                   k: Int = 64, bands: Int = 32): DataFrame =
    dedupMinhashDf(Tables.documents(s, dir), tau, k, bands)

  /** DataFrame-generic core: expects canonical (doc_id, text). The
    * shingle table comes from TextOps.shingleTable — memoized, so the
    * n-gram Jaccard and MinHash operators share one evaluation. */
  def dedupMinhashDf(input: DataFrame, tau: Double = 0.3,
                     k: Int = 64, bands: Int = 32): DataFrame = {
    val rows = k / bands
    val docs = TextOps.shingleTable(input).filter(size(col("sh")) > 0)
    val sigs = docs
      .select(col("doc_id"), explode(col("sh")).as("s"))
      // one string hash per shingle, then k cheap long re-hashes — vs
      // hashing the string k times (~6× less hashing work)
      .select(col("doc_id"), xxhash64(col("s")).as("s64"))
      .select(col("doc_id") +: (0 until k).map(i =>
        xxhash64(lit(i), col("s64")).as(s"h$i")): _*)
      .groupBy(col("doc_id"))
      .agg(min(col("h0")).as("m0"),
           (1 until k).map(i => min(col(s"h$i")).as(s"m$i")): _*)
    val bandKeys = sigs.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        xxhash64(lit(b) +: (0 until rows).map(j => col(s"m${b * rows + j}")): _*)
      }: _*)).as("band_key"))
    val candidates = bandKeys.as("a")
      .join(bandKeys.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    candidates
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        r(col("inter") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ------------------------------------------------------------- SimHash

  /** 64 signed bit-sums over the token stream: for each token, bit j of
    * xxhash64(token) votes +1/−1; the sign of the sum is fingerprint
    * bit j. Bit extraction goes through lpad(bin(hash)) — pure codegen'd
    * string ops (shiftright doesn't take a lambda-variable shift). */
  def simhashBits(toks: Column): Column = {
    // hash+bin+lpad once per token (hoisted out of the per-bit lambda —
    // inside it the subexpression would be re-evaluated 64× per token)
    val bitStrings = transform(toks, t => lpad(bin(xxhash64(t)), 64, "0"))
    val sums = aggregate(
      bitStrings,
      transform(sequence(lit(1), lit(64)), _ => lit(0)),
      (acc, bits) =>
        zip_with(acc, sequence(lit(1), lit(64)),
          (a, j) => a + when(bits.substr(j, lit(1)) === "1", 1).otherwise(-1)))
    transform(sums, s => when(s >= 0, 1).otherwise(0))
  }

  /** Hamming distance between two 0/1 bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0), (acc, v) => acc + v)

  /** Pack a 16-bit slice of the bit array into an int band key. */
  private def bandOf(bits: Column, band: Int): Column =
    aggregate(slice(bits, band * 16 + 1, 16), lit(0), (acc, x) => acc * 2 + x)

  /** #28 SimHash dedup: 64-bit fingerprint, 4 bands × 16 bits. By the
    * pigeonhole principle any pair with hamming ≤ 3 shares at least one
    * of 4 exact band keys, so the bucket join is lossless up to the
    * default maxHamming=3; larger thresholds trade recall like any LSH.
    * (Default maxHamming=8 keeps only near-identical term profiles;
    * precision stays exact — hamming is verified.) */
  def dedupSimhash(s: SparkSession, dir: String, maxHamming: Int = 8): DataFrame =
    dedupSimhashDf(Tables.documents(s, dir), maxHamming)

  /** DataFrame-generic core: expects canonical (doc_id, text). */
  def dedupSimhashDf(input: DataFrame, maxHamming: Int = 8): DataFrame = {
    val docs = input
      .select(col("doc_id"), simhashBits(lowerTokens(col("text"))).as("bits"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandKeys = docs.select(col("doc_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), bandOf(col("bits"), b).as("key"))): _*)).as("bk"))
    val candidates = bandKeys.as("a")
      .join(bandKeys.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    candidates
      .join(docs.select(col("doc_id").as("id_a"), col("bits").as("bits_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("bits").as("bits_b")), "id_b")
      .withColumn("hamming", hamming(col("bits_a"), col("bits_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
