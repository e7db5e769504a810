package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2 F33-F34): media as opaque
  * `binary` payloads + typed metadata, with decode / frame-sample
  * implemented as per-partition batch iterators — the real 100 TB shape
  * (payload stays columnar, decode is a narrow map, no shuffle).
  *
  * The actual codec is STUBBED (no image/audio libs in this
  * environment): `FakeDecoder` derives deterministic "frames" from the
  * payload bytes via md5, so the pipeline is end-to-end testable and
  * oracle-checkable while the decoder body is the single seam a real
  * codec would replace.
  */
object Multimodal {

  /** #33 ingest: text → binary payload + typed media metadata. The
    * payload column is genuine binary; the compared output carries its
    * md5 (parquet binary columns don't hash-compare portably). */
  def mmIngest(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col("text").cast("binary")).as("n_bytes"),
      (lit(64) + col("doc_id") % 960).as("width"),
      (lit(64) + (col("doc_id") * 7) % 960).as("height"),
      lit(3).as("channels"))
      .withColumn("payload_md5", md5(col("payload")))
      .drop("payload")

  val mmIngestSql: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |       octet_length(CAST(text AS BLOB)) AS n_bytes,
      |       64 + doc_id % 960 AS width,
      |       64 + (doc_id * 7) % 960 AS height,
      |       3 AS channels,
      |       md5(text) AS payload_md5
      |FROM documents""".stripMargin

  /** The decode seam: a real implementation would wrap an image/video
    * codec here; the batch-iterator shape (one call per partition, lazy
    * iterator in/out) is exactly what a JNI/native decoder needs. */
  object FakeDecoder {
    val frameBytes = 100

    /** Deterministic fake frame extraction: one frame per 100 payload
      * bytes, fingerprint = md5(payloadMd5:frameIdx). */
    def decode(docId: Long, payload: Array[Byte]): Iterator[(Long, Int, String)] = {
      val md = MessageDigest.getInstance("MD5")
      val payloadMd5 = md.digest(payload).map("%02x".format(_)).mkString
      val nFrames = 1 + payload.length / frameBytes
      (0 until nFrames).iterator.map { i =>
        val fp = MessageDigest.getInstance("MD5")
          .digest(s"$payloadMd5:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (docId, i, fp)
      }
    }
  }

  /** Feature extraction through the stub decoder: an 8-dim deterministic
    * pseudo-feature vector per payload (hash-derived — the seam a real
    * image/audio featurizer replaces). Emitted as wide columns so the
    * oracle compares scalars. Map-only: one scan, no shuffle. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val pm = md5(col("text").cast("binary"))
    val feats = (0 until 8).map { j =>
      graft.Parity.r(
        conv(substring(md5(concat(pm, lit(s":$j")).cast("binary")), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0), 6).as(s"f$j")
    }
    Tables.documents(s, dir).select(col("doc_id") +: feats: _*)
  }

  val mmFeaturesSql: String = {
    val feats = (0 until 8).map { j =>
      s"floor((CAST(('0x' || substr(md5(md5(text) || ':$j'), 1, 8)) AS BIGINT) / 4294967296.0) * 1e6 + 0.5) / 1e6 AS f$j"
    }.mkString(",\n       ")
    s"""SELECT doc_id,
       |       $feats
       |FROM documents""".stripMargin
  }

  /** Resize through the stub decoder: metadata transform (halved dims,
    * clamped at 1) + re-fingerprinted payload — the shape of a real
    * thumbnailing pass (binary in → binary out, metadata updated). */
  def mmResize(s: SparkSession, dir: String): DataFrame =
    mmIngest(s, dir)
      .select(col("doc_id"),
        greatest(lit(1), (col("width") / 2).cast("int")).as("width"),
        greatest(lit(1), (col("height") / 2).cast("int")).as("height"),
        col("channels"),
        md5(concat(col("payload_md5"), lit(":resized")).cast("binary"))
          .as("resized_md5"))

  val mmResizeSql: String =
    """SELECT doc_id,
      |       GREATEST(1, CAST(floor((64 + doc_id % 960) / 2) AS INT)) AS width,
      |       GREATEST(1, CAST(floor((64 + (doc_id * 7) % 960) / 2) AS INT)) AS height,
      |       3 AS channels,
      |       md5(md5(text) || ':resized') AS resized_md5
      |FROM documents""".stripMargin

  /** #34 frame sampling through the decode seam: payload → per-frame
    * rows via `mapPartitions` (narrow, partition-local batches — the
    * plan is scan → decode-map → done, nothing wide). */
  def mmFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        FakeDecoder.decode(id, payload)
      })
      .toDF("doc_id", "frame_idx", "frame_fp")
  }

  val mmFramesSql: String =
    """SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
      |       md5(md5(text) || ':' || CAST(f.f AS INT)) AS frame_fp
      |FROM documents
      |CROSS JOIN LATERAL (SELECT unnest(range(0, 1 + octet_length(CAST(text AS BLOB)) // 100)) AS f) f""".stripMargin

  /** 16-bit luma-like projection of the frame fingerprint — the frame
    * feature #130 cuts on and #147 selects keyframes from. */
  private def frameLuma = conv(substring(col("frame_fp"), 1, 4), 16, 10).cast("int")

  /** Per-frame cut flags (doc_id, frame_idx, cut) — the ONE shot-
    * boundary rule #130 reports on and #147 compacts to scenes: the
    * inter-frame luma jump past `threshold`, a lag window ordered by
    * frame index and partitioned per asset (bounded by
    * frames-per-asset, never cross-asset). */
  private def cutFlags(s: SparkSession, dir: String, threshold: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    mmFrames(s, dir)
      .withColumn("luma", frameLuma)
      .withColumn("cut",
        when(abs(col("luma") - lag(col("luma"), 1).over(w)) > threshold, 1)
          .otherwise(0))
      .select(col("doc_id"), col("frame_idx"), col("cut"))
  }

  /** SQL twin of [[cutFlags]]: the frames + flagged CTE prefix shared
    * by the #130 and #147 oracles. */
  private def cutFlagsSql(threshold: Int): String =
    s"""WITH frames AS (
       |  SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
       |         CAST(('0x' || substr(md5(md5(text) || ':' || CAST(f.f AS INT)), 1, 4)) AS INT) AS luma
       |  FROM documents
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, 1 + octet_length(CAST(text AS BLOB)) // 100)) AS f) f),
       |flagged AS (
       |  SELECT doc_id, frame_idx,
       |         CASE WHEN abs(luma - lag(luma) OVER (PARTITION BY doc_id ORDER BY frame_idx)) > $threshold
       |              THEN 1 ELSE 0 END AS cut
       |  FROM frames)""".stripMargin

  /** #130 mm_scene_cuts: shot-boundary detection over the sampled
    * frame stream — per asset, flag a SCENE CUT wherever the
    * inter-frame feature distance jumps past a threshold, and report
    * (n_frames, n_cuts, cut_rate). The video-curation primitive that
    * decides which keyframes a training pipeline keeps. The per-frame
    * feature is a deterministic 16-bit projection of the frame
    * fingerprint (the decode stub's md5 — a real decoder would emit a
    * luma histogram through the same seam); the cut rule is the shared
    * [[cutFlags]] core. Plan: decode-map → one per-asset window → agg.
    */
  def mmSceneCuts(s: SparkSession, dir: String, threshold: Int = 21845): DataFrame =
    cutFlags(s, dir, threshold)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
           sum(col("cut")).as("n_cuts"))
      .withColumn("cut_rate",
        graft.Parity.r(col("n_cuts").cast("double") / col("n_frames"), 6))
      .orderBy(col("doc_id"))

  def mmSceneCutsSql(threshold: Int = 21845): String =
    cutFlagsSql(threshold) +
    s"""
       |SELECT doc_id, count(*) AS n_frames,
       |       CAST(sum(cut) AS BIGINT) AS n_cuts,
       |       floor((CAST(sum(cut) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS cut_rate
       |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin

  /** #147 mm_keyframes: keyframe selection — compact the #130 cut
    * flags into SCENES (cumulative cut count per asset) and emit one
    * row per scene with its keyframe (the scene's first frame, the
    * standard representative-frame rule) and length. This is the frame
    * the caption/embedding stage actually processes: the step between
    * shot detection and feature extraction in a video-curation
    * pipeline. Same single decode pass and per-asset bounded windows
    * as #130 (one extra cumulative sum on the same window), then one
    * bounded per-scene rollup. */
  def mmKeyframes(s: SparkSession, dir: String, threshold: Int = 21845): DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    cutFlags(s, dir, threshold)
      .withColumn("scene_id", sum(col("cut")).over(wCum))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(min(col("frame_idx")).as("keyframe_idx"),
           count(lit(1)).as("n_frames"))
      .orderBy(col("doc_id"), col("scene_id"))
  }

  def mmKeyframesSql(threshold: Int = 21845): String =
    cutFlagsSql(threshold) +
    s""",
       |scenes AS (
       |  SELECT doc_id, frame_idx,
       |         CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
       |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
       |  FROM flagged)
       |SELECT doc_id, scene_id,
       |       CAST(min(frame_idx) AS INT) AS keyframe_idx,
       |       count(*) AS n_frames
       |FROM scenes GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** #138 mm_audio_vad: voice-activity segmentation over the decoded
    * frame stream — treat each payload as an audio clip whose frames
    * carry an energy level (here a deterministic [0,1) projection of
    * the frame fingerprint; a real decoder emits RMS energy through the
    * same seam), mark frames with energy ≥ τ as voiced, and compact
    * maximal voiced runs into SEGMENTS (gaps-and-islands per asset).
    * Per asset: frame/voiced counts, segment count, longest segment,
    * voiced ratio — the speech-curation primitive that decides which
    * clip regions feed an ASR training set.
    *
    * Scale shape: ONE decode-map pass (unvoiced frames ride through
    * with a NULL island id instead of forcing a second decode for the
    * totals) → one per-asset window (bounded by frames-per-asset, the
    * #130 contract) for the island ids → two bounded rollups; silent
    * assets keep their NULL-island group, so no second scan or join is
    * needed to retain them. */
  def mmAudioVad(s: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    val energy = graft.Parity.r(
      conv(substring(col("frame_fp"), 1, 8), 16, 10).cast("double") /
        4294967296.0, 6)
    val flagged = mmFrames(s, dir)
      .withColumn("voiced", (energy >= tau).cast("int"))
      // cumulative voiced count ≡ row_number among voiced rows, so the
      // island id matches the classic gaps-and-islands formula while
      // unvoiced rows stay in the frame (grp NULL)
      .withColumn("grp",
        when(col("voiced") === 1,
             col("frame_idx") - sum(col("voiced")).over(w)))
    flagged.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_frames"),
           sum(when(col("grp").isNotNull, col("cnt")).otherwise(0L)).as("n_voiced"),
           sum(when(col("grp").isNotNull, 1L).otherwise(0L)).as("n_segments"),
           coalesce(max(when(col("grp").isNotNull, col("cnt"))), lit(0L))
             .as("longest_segment"))
      .withColumn("voiced_ratio",
        graft.Parity.r(col("n_voiced").cast("double") / col("n_frames"), 6))
      .orderBy(col("doc_id"))
  }

  def mmAudioVadSql(tau: Double = 0.5): String =
    s"""WITH frames AS (
       |  SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
       |         floor((CAST(('0x' || substr(md5(md5(text) || ':' || CAST(f.f AS INT)), 1, 8)) AS BIGINT) / 4294967296.0) * 1e6 + 0.5) / 1e6 AS energy
       |  FROM documents
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, 1 + octet_length(CAST(text AS BLOB)) // 100)) AS f) f),
       |voiced AS (
       |  SELECT doc_id, frame_idx,
       |         frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS grp
       |  FROM frames WHERE energy >= $tau),
       |segs AS (
       |  SELECT doc_id, CAST(sum(seg_len) AS BIGINT) AS n_voiced,
       |         count(*) AS n_segments,
       |         CAST(max(seg_len) AS BIGINT) AS longest_segment
       |  FROM (SELECT doc_id, grp, count(*) AS seg_len FROM voiced GROUP BY 1, 2)
       |  GROUP BY 1),
       |totals AS (SELECT doc_id, count(*) AS n_frames FROM frames GROUP BY 1)
       |SELECT t.doc_id, t.n_frames,
       |       COALESCE(s.n_voiced, 0) AS n_voiced,
       |       COALESCE(s.n_segments, 0) AS n_segments,
       |       COALESCE(s.longest_segment, 0) AS longest_segment,
       |       floor((CAST(COALESCE(s.n_voiced, 0) AS DOUBLE) / t.n_frames) * 1e6 + 0.5) / 1e6 AS voiced_ratio
       |FROM totals t LEFT JOIN segs s USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** #34d payload-level exact dedup on the BINARY column: md5 of the
    * raw bytes groups identical media regardless of metadata — the
    * first pass of any multimodal dedup (perceptual hashing would
    * follow the same bucket-join shape on a fuzzier key). Map-side
    * partial aggs; the shuffle carries one row per distinct payload. */
  def mmDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"),
           sum(octet_length(col("payload"))).cast("long").as("total_bytes"))

  val mmDedupSql: String =
    """SELECT md5(text) AS payload_md5, min(doc_id) AS keep_id,
      |       count(*) AS n_dups,
      |       CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1""".stripMargin

  /** #107 mm_phash_near_dup: the perceptual-hash NEAR-dup pass that
    * follows #34d's exact pass — quantize each payload's feature vector
    * (the #34b stub featurizer; a real pHash DCT slots into the same
    * seam) to a sign-bit code, bucket-join on the code, verify
    * candidates with an L1 feature distance. This is the standard
    * image-dedup shape at scale: the join key is the 8-bit code (pair
    * space Σ bucket², never all-pairs), the verify distance runs on
    * candidates only, and the whole feature table is one map-only scan.
    * The report keeps every CANDIDATE pair with its verification
    * distance and decision (`is_dup = l1 ≤ τ`) — the shape a dedup
    * triage actually consumes: bucket recall and verify precision are
    * both visible, and a corpus with no true dups still documents its
    * candidate load. The stub featurizer is hash-derived, so distinct
    * payloads decorrelate (is_dup fires only for identical payloads —
    * the spec cross-checks against #34d); with a real featurizer the
    * SAME plan finds perceptual neighbors. */
  def mmPhashNearDup(s: SparkSession, dir: String, tau: Double = 0.05): DataFrame = {
    val f = mmFeatures(s, dir)
    val code = (0 until 8).map(j => when(col(s"f$j") >= 0.5, 1 << j).otherwise(0))
      .reduce(_ + _)
    val coded = f.withColumn("code", code.cast("int"))
    val l1 = (0 until 8).map(j => abs(col(s"a.f$j") - col(s"b.f$j"))).reduce(_ + _)
    coded.as("a").join(coded.as("b"),
        col("a.code") === col("b.code") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("l1_dist", graft.Parity.r(l1, 6))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
              col("a.code").as("code"), col("l1_dist"),
              (col("l1_dist") <= tau).as("is_dup"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** #155 mm_av_sync: audio/visual ALIGNMENT — the #130 scene
    * segmentation and the #138 voice-activity flags reconciled on the
    * same frame clock: per (asset, scene), the voiced-frame share and a
    * speech/silent class. This is the table an A/V curation pipeline
    * reads to route scenes (speech scenes → ASR/captioning, silent
    * scenes → visual-only features) — the join of shot detection and
    * VAD that neither produces alone.
    *
    * Scale shape: ONE decode pass computes BOTH per-frame features
    * (16-bit luma for the cut rule, [0,1) energy for the VAD rule — a
    * real decoder emits both through the same seam), the scene id is
    * the same per-asset bounded cumulative window as #147, and the
    * readout is one bounded (asset, scene) rollup. No join between the
    * two chains — the alignment is free because both rules ride the
    * same frame stream. */
  def mmAvSync(s: SparkSession, dir: String, threshold: Int = 21845,
               tau: Double = 0.5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val energy = graft.Parity.r(
      conv(substring(col("frame_fp"), 1, 8), 16, 10).cast("double") /
        4294967296.0, 6)
    mmFrames(s, dir)
      .withColumn("luma", frameLuma)
      .withColumn("voiced", (energy >= tau).cast("long"))
      .withColumn("cut",
        when(abs(col("luma") - lag(col("luma"), 1).over(w)) > threshold, 1)
          .otherwise(0))
      .withColumn("scene_id", sum(col("cut")).over(wCum).cast("long"))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("voiced")).as("n_voiced"))
      .withColumn("speech_ratio",
        graft.Parity.r(col("n_voiced").cast("double") / col("n_frames"), 6))
      .withColumn("is_speech", col("speech_ratio") >= 0.5)
      .orderBy(col("doc_id"), col("scene_id"))
  }

  def mmAvSyncSql(threshold: Int = 21845, tau: Double = 0.5): String = {
    val ratio = graft.Parity.sqlR("CAST(sum(voiced) AS DOUBLE) / count(*)", 6)
    s"""WITH frames AS (
       |  SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
       |         CAST(('0x' || substr(md5(md5(text) || ':' || CAST(f.f AS INT)), 1, 4)) AS INT) AS luma,
       |         floor((CAST(('0x' || substr(md5(md5(text) || ':' || CAST(f.f AS INT)), 1, 8)) AS BIGINT) / 4294967296.0) * 1e6 + 0.5) / 1e6 AS energy
       |  FROM documents
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, 1 + octet_length(CAST(text AS BLOB)) // 100)) AS f) f),
       |flagged AS (
       |  SELECT doc_id, frame_idx,
       |         CASE WHEN energy >= $tau THEN 1 ELSE 0 END AS voiced,
       |         CASE WHEN abs(luma - lag(luma) OVER (PARTITION BY doc_id ORDER BY frame_idx)) > $threshold
       |              THEN 1 ELSE 0 END AS cut
       |  FROM frames),
       |scenes AS (
       |  SELECT doc_id, voiced,
       |         CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
       |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
       |  FROM flagged)
       |SELECT doc_id, scene_id, count(*) AS n_frames,
       |       CAST(sum(voiced) AS BIGINT) AS n_voiced,
       |       $ratio AS speech_ratio,
       |       ($ratio >= 0.5) AS is_speech
       |FROM scenes GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  def mmPhashNearDupSql(tau: Double = 0.05): String = {
    val feats = (0 until 8).map { j =>
      s"floor((CAST(('0x' || substr(md5(md5(text) || ':$j'), 1, 8)) AS BIGINT) / 4294967296.0) * 1e6 + 0.5) / 1e6 AS f$j"
    }.mkString(", ")
    val code = (0 until 8).map(j => s"(CASE WHEN f$j >= 0.5 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    val l1 = (0 until 8).map(j => s"abs(a.f$j - b.f$j)").mkString(" + ")
    s"""WITH f AS (SELECT doc_id, $feats FROM documents),
       |coded AS (SELECT *, CAST($code AS INT) AS code FROM f)
       |SELECT id_a, id_b, code, l1_dist, l1_dist <= $tau AS is_dup FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.code,
       |         floor(($l1) * 1e6 + 0.5) / 1e6 AS l1_dist
       |  FROM coded a JOIN coded b ON a.code = b.code AND a.doc_id < b.doc_id)
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ------------------------------------------------- #165 mm_integrity

  /** Declared container formats and their 4-byte magic sentinels (stub
    * formats — a real deployment swaps the sentinel table for PNG/JPEG/
    * RIFF signatures; the audit logic is format-agnostic). */
  private[graft] val MediaFormats: Seq[(String, String)] = Seq(
    "image/png" -> "PNG!", "image/jpeg" -> "JPG!", "audio/wav" -> "WAV!")

  /** Every 17th payload is written with the NEXT format's magic — the
    * deterministic corruption the audit must catch. */
  private[graft] val CorruptEvery = 17L
  private[graft] val TruncatedBelowBytes = 16L

  /** #165 mm_integrity: binary-payload INTEGRITY audit — the quarantine
    * gate a multimodal ingest runs before any decode is attempted: sniff
    * the payload's leading magic bytes against the declared mime,
    * flag truncated (< 16 B) and magic-mismatched payloads, and roll up
    * a per-(source, mime) quarantine report. The ingest stage here
    * builds the payloads itself (mime by doc_id mod 3; every 17th
    * payload deliberately mis-labeled), so the audit has known ground
    * truth end-to-end while the decode stays stubbed.
    *
    * Scale shape: construction and audit are ONE map-only pass over a
    * genuine `binary` column (sniff = slice of the first 4 bytes — no
    * decode, no shuffle), then a |sources|×|mimes|-key rollup. At
    * 100 TB this is the cheap pass that keeps codec workers from
    * choking on garbage. */
  def mmIntegrity(s: SparkSession, dir: String): DataFrame = {
    val mimeIdx = (col("doc_id") % 3).cast("int")
    val magicIdx = when(col("doc_id") % CorruptEvery === 0,
      ((col("doc_id") + 1) % 3).cast("int")).otherwise(mimeIdx)
    val mimes = array(MediaFormats.map(f => lit(f._1)): _*)
    val magics = array(MediaFormats.map(f => lit(f._2)): _*)
    val withPayload = Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      element_at(mimes, mimeIdx + 1).as("mime"),
      concat(element_at(magics, magicIdx + 1), col("text")).cast("binary")
        .as("payload"))
    val audited = withPayload.select(
      col("source"), col("mime"),
      octet_length(col("payload")).as("n_bytes"),
      substring(col("payload"), 1, 4).cast("string").as("sniffed"),
      element_at(magics,
        array_position(mimes, col("mime")).cast("int")).as("expected"))
      .withColumn("status",
        when(col("n_bytes") < TruncatedBelowBytes, lit("truncated"))
          .when(col("sniffed") =!= col("expected"), lit("magic_mismatch"))
          .otherwise(lit("ok")))
    audited.groupBy(col("source"), col("mime"))
      .agg(count(lit(1)).as("n_payloads"),
           sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
           sum(when(col("status") === "magic_mismatch", 1L).otherwise(0L))
             .as("n_magic_mismatch"),
           sum(when(col("status") === "truncated", 1L).otherwise(0L))
             .as("n_truncated"))
      .withColumn("quarantine_rate",
        graft.Parity.r((col("n_payloads") - col("n_ok")) / col("n_payloads"), 6))
      .orderBy(col("source"), col("mime"))
  }

  val mmIntegritySql: String = {
    val mimeCase = MediaFormats.zipWithIndex
      .map { case ((m, _), i) => s"WHEN $i THEN '$m'" }.mkString(" ")
    val magicCase = MediaFormats.zipWithIndex
      .map { case ((_, g), i) => s"WHEN $i THEN '$g'" }.mkString(" ")
    s"""WITH p AS (
       |  SELECT doc_id, source,
       |         CASE doc_id % 3 $mimeCase END AS mime,
       |         (CASE (CASE WHEN doc_id % $CorruptEvery = 0
       |                     THEN (doc_id + 1) % 3 ELSE doc_id % 3 END)
       |          $magicCase END) || text AS payload_str
       |  FROM documents),
       |a AS (
       |  SELECT source, mime,
       |         CASE WHEN octet_length(encode(payload_str)) < $TruncatedBelowBytes
       |                THEN 'truncated'
       |              WHEN substr(payload_str, 1, 4) <>
       |                   (CASE mime ${MediaFormats.map { case (m, g) => s"WHEN '$m' THEN '$g'" }.mkString(" ")} END)
       |                THEN 'magic_mismatch'
       |              ELSE 'ok' END AS status
       |  FROM p)
       |SELECT source, mime, count(*) AS n_payloads,
       |       CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       |       CAST(sum(CASE WHEN status = 'magic_mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_magic_mismatch,
       |       CAST(sum(CASE WHEN status = 'truncated' THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
       |       ${graft.Parity.sqlR("(count(*) - sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END)) / count(*)", 6)} AS quarantine_rate
       |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
