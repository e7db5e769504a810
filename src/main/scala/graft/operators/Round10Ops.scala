package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Parity._
import graft.functions.TextFunctions.lowerTokens
import graft.sources.Tables

/** Round-10 operators (SURVEY §2 #356-#357): content-defined-chunking
  * dedup and the shippable BPE vocabulary artifact.
  */
object Round10Ops {

  /** CDC gram width (the rolling window that decides boundaries) and
    * the cut modulus — a position opens a new chunk when its gram hash
    * ≡ 0 (mod 64), so chunks average ~64 tokens: long enough to be
    * meaningful dedup units, short enough that a shared paragraph
    * yields several shared chunks. */
  val CdcK = 8
  val CdcModulus = 64

  /** #356 dedup_cdc_chunks: CONTENT-DEFINED CHUNKING dedup — the
    * rsync/LBFS boundary trick applied to corpus curation: chunk
    * boundaries are set by the CONTENT (token positions whose rolling
    * [[CdcK]]-gram hash ≡ 0 mod [[CdcModulus]]), so an insertion or
    * deletion shifts only the chunks it touches and identical passages
    * re-align downstream — the property fixed-grid chunking (#24i)
    * lacks and #294's per-position marking pays O(every position) to
    * get. The report: per source, chunk count, mean chunk width, the
    * chunk mass duplicated across documents (a chunk is duplicated
    * when its exact token content appears in ≥2 docs), and the
    * duplicated-token share — the chunk-granular dedup savings
    * estimate a storage/curation layer quotes.
    *
    * Scale shape: boundaries come from the persisted #294 gram table
    * at k=8 (one O(n) rolling pass, shared machinery); chunk rows
    * partition the corpus (Σ chunk widths = corpus tokens, so the
    * chunk-content hashing is O(n) total); duplicate detection is a
    * `groupBy(chunk hash) → countDistinct(doc) ≥ 2` rollup — no pair
    * join, the #294 doc-frequency discipline; the final rollup is
    * ≤|sources| rows. The boundary window partitions per doc (state
    * bounded by cuts-per-doc). */
  def dedupCdcChunks(s: SparkSession, dir: String,
                     k: Int = CdcK, modulus: Int = CdcModulus): DataFrame =
    cdcChunksDf(Tables.documents(s, dir), k, modulus)

  /** Per-occurrence CDC chunk table — the shared basis of #356's dup
    * accounting and #361's keep-first removal: one row per chunk
    * occurrence, (doc_id, source, s = 0-based token start, width,
    * ch = md5 of the chunk's token content). Σ widths = corpus tokens
    * (chunks partition each doc's token stream). */
  private[graft] def cdcChunkTable(docs: DataFrame, k: Int = CdcK,
                                   modulus: Int = CdcModulus): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      lowerTokens(col("text")).as("w"))
    // content-defined cuts: 0-based gram positions with h1 ≡ 0 (mod m),
    // excluding position 0 (a cut there is the doc start anyway)
    val cuts = SubstringDedup.gramTable(docs, k)
      .filter(col("h1") % modulus === 0 && col("pos") > 0)
      .select(col("doc_id"), col("pos"))
    val starts = cuts
      .unionByName(toks.select(col("doc_id"), lit(0).as("pos")))
      .distinct()
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    starts
      .withColumn("nxt", lead(col("pos"), 1).over(byPos))
      .join(toks, "doc_id")
      .select(col("doc_id"), col("source"), col("pos").as("s"),
              coalesce(col("nxt"), size(col("w"))).as("e"), col("w"))
      .filter(col("e") > col("s"))
      .select(col("doc_id"), col("source"), col("s"),
              (col("e") - col("s")).as("width"),
              md5(concat_ws(" ",
                slice(col("w"), col("s") + 1, col("e") - col("s")))
                .cast("binary")).as("ch"))
  }

  /** DataFrame-generic core: expects (doc_id, source, text). */
  private[graft] def cdcChunksDf(docs: DataFrame, k: Int = CdcK,
                                 modulus: Int = CdcModulus): DataFrame = {
    val chunks = cdcChunkTable(docs, k, modulus)
    // dup set is unbounded (a boilerplate-heavy corpus can flag most
    // chunks) — shuffle join, never broadcast: the #294 reasoning
    val dup = chunks.groupBy(col("ch"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("ch"), lit(1).as("isdup"))
    chunks.join(dup, Seq("ch"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
           sum(col("width")).cast("long").as("n_tokens"),
           sum(when(col("isdup").isNotNull, 1L).otherwise(0L))
             .as("n_dup_chunks"),
           sum(when(col("isdup").isNotNull, col("width")).otherwise(0L))
             .cast("long").as("dup_tokens"))
      .select(col("source"), col("n_chunks"), col("n_tokens"),
              r(col("n_tokens").cast("double") / col("n_chunks"), 6)
                .as("mean_chunk_tokens"),
              col("n_dup_chunks"), col("dup_tokens"),
              r(col("dup_tokens").cast("double") / col("n_tokens"), 6)
                .as("dup_token_share"))
      .orderBy(col("source"))
  }

  /** Oracle: the shared rolling-gram CTE at k, the same mod-m cut
    * rule, chunk rebuild + md5 content keys, df ≥ 2, source rollup. */
  def dedupCdcChunksSql(k: Int = CdcK, modulus: Int = CdcModulus): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS w
       |  FROM documents),
       |${SubstringDedup.gramsSql(k)},
       |cuts AS (
       |  SELECT doc_id, pos - 1 AS pos FROM grams
       |  WHERE h1 % $modulus = 0 AND pos > 1),
       |starts AS (
       |  SELECT DISTINCT doc_id, pos FROM (
       |    SELECT doc_id, pos FROM cuts
       |    UNION ALL SELECT doc_id, 0 FROM toks)),
       |chunks AS (
       |  SELECT st.doc_id, t.source,
       |         coalesce(st.nxt, len(t.w)) - st.s AS width,
       |         md5(array_to_string(
       |           t.w[CAST(st.s + 1 AS INT):CAST(coalesce(st.nxt, len(t.w)) AS INT)],
       |           ' ')) AS ch
       |  FROM (
       |    SELECT doc_id, pos AS s,
       |           lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
       |    FROM starts) st
       |  JOIN toks t ON t.doc_id = st.doc_id
       |  WHERE coalesce(st.nxt, len(t.w)) > st.s),
       |dup AS (
       |  SELECT ch FROM chunks GROUP BY ch
       |  HAVING count(DISTINCT doc_id) >= 2)
       |SELECT c.source,
       |       count(*) AS n_chunks,
       |       CAST(sum(c.width) AS BIGINT) AS n_tokens,
       |       ${sqlR("CAST(sum(c.width) AS DOUBLE) / count(*)", 6)}
       |         AS mean_chunk_tokens,
       |       CAST(sum(CASE WHEN d.ch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dup_chunks,
       |       CAST(sum(CASE WHEN d.ch IS NOT NULL THEN c.width ELSE 0 END)
       |         AS BIGINT) AS dup_tokens,
       |       ${sqlR(
             "CAST(sum(CASE WHEN d.ch IS NOT NULL THEN c.width ELSE 0 END) " +
             "AS DOUBLE) / sum(c.width)", 6)} AS dup_token_share
       |FROM chunks c LEFT JOIN dup d ON d.ch = c.ch
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------- #361 corpus_apply_cdc_removal

  /** #361 corpus_apply_cdc_removal: MATERIALIZE the CDC-deduped corpus —
    * completes the chunk-granular story the way #355 completed
    * #294/#301: #356 accounts for duplicate chunk mass, this EMITS the
    * rewritten corpus under KEEP-FIRST at chunk granularity. Rule
    * (mirroring #301/#355's convention): a chunk content hash
    * duplicated across ≥2 docs (#356's dup rule) is canonical in its
    * MINIMUM doc id — every occurrence in that doc is kept, every
    * occurrence elsewhere is deleted; unduplicated chunks always
    * survive. Because chunks partition each doc's token stream, the
    * rebuilt text is the ordered concatenation of surviving chunks,
    * and tokens_out = n_tokens − Σ removed chunk widths
    * (Round10OpsSpec reconciles the removed mass against #356's
    * per-source dup_tokens: removed = dup_tokens − canon-kept mass).
    *
    * Scale shape: shares [[cdcChunkTable]] (gram table persisted, one
    * O(n) pass); the canon rollup is groupBy(chunk hash) — no pair
    * join; the rebuild joins surviving (s, width) spans back to the
    * doc token array and collects per-doc slices — state bounded by
    * document length, the standard text-operator class. */
  def corpusApplyCdcRemoval(s: SparkSession, dir: String,
                            k: Int = CdcK, modulus: Int = CdcModulus): DataFrame =
    applyCdcRemovalDf(Tables.documents(s, dir), k, modulus)

  /** DataFrame-generic core: expects (doc_id, source, text). */
  private[graft] def applyCdcRemovalDf(docs: DataFrame, k: Int = CdcK,
                                       modulus: Int = CdcModulus): DataFrame = {
    val chunks = cdcChunkTable(docs, k, modulus)
    // dup chunk hashes with their canonical (minimum) doc — unbounded
    // set, shuffle join (the #294/#356 reasoning: never broadcast)
    val canon = chunks.groupBy(col("ch"))
      .agg(countDistinct(col("doc_id")).as("df"),
           min(col("doc_id")).as("canon_doc"))
      .filter(col("df") >= 2)
      .select(col("ch"), col("canon_doc"))
    val kept = chunks.join(canon, Seq("ch"), "left")
      .filter(col("canon_doc").isNull || col("doc_id") === col("canon_doc"))
      .select(col("doc_id"), col("s"), col("width"))
    // null text coalesces to '' BEFORE tokenizing (the BpeEncode
    // contract): Spark's legacy sizeOfNull would emit n_tokens = -1
    // where the oracle's len(NULL) is NULL — a parity break on
    // null-text input (round-11 advisory)
    val toks = docs.select(col("doc_id"),
      lowerTokens(coalesce(col("text"), lit(""))).as("w"))
    val rebuilt = kept.join(toks, "doc_id")
      .select(col("doc_id"), col("s"),
              col("width").cast("long").as("width"),
              slice(col("w"), col("s") + 1, col("width")).as("piece"))
      .groupBy(col("doc_id"))
      .agg(sum(col("width")).as("tokens_out"),
           sort_array(collect_list(struct(col("s"), col("piece")))).as("ps"))
      .select(col("doc_id"), col("tokens_out"),
              array_join(flatten(expr("transform(ps, x -> x.piece)")), " ")
                .as("text_out"))
    docs.select(col("doc_id"),
        size(lowerTokens(coalesce(col("text"), lit("")))).cast("long")
          .as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
              coalesce(col("tokens_out"), lit(0L)).as("tokens_out"),
              coalesce(col("text_out"), lit("")).as("text_out"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the #356 chunk CTEs with the chunk string kept, the canon
    * rollup, the keep-first complement, string_agg rebuild in s order. */
  def corpusApplyCdcRemovalSql(k: Int = CdcK,
                               modulus: Int = CdcModulus): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS w
       |  FROM documents),
       |${SubstringDedup.gramsSql(k)},
       |cuts AS (
       |  SELECT doc_id, pos - 1 AS pos FROM grams
       |  WHERE h1 % $modulus = 0 AND pos > 1),
       |starts AS (
       |  SELECT DISTINCT doc_id, pos FROM (
       |    SELECT doc_id, pos FROM cuts
       |    UNION ALL SELECT doc_id, 0 FROM toks)),
       |chunks AS (
       |  SELECT st.doc_id, st.s,
       |         coalesce(st.nxt, len(t.w)) - st.s AS width,
       |         md5(array_to_string(
       |           t.w[CAST(st.s + 1 AS INT):CAST(coalesce(st.nxt, len(t.w)) AS INT)],
       |           ' ')) AS ch,
       |         array_to_string(
       |           t.w[CAST(st.s + 1 AS INT):CAST(coalesce(st.nxt, len(t.w)) AS INT)],
       |           ' ') AS chunk_str
       |  FROM (
       |    SELECT doc_id, pos AS s,
       |           lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
       |    FROM starts) st
       |  JOIN toks t ON t.doc_id = st.doc_id
       |  WHERE coalesce(st.nxt, len(t.w)) > st.s),
       |canon AS (
       |  SELECT ch, min(doc_id) AS canon_doc FROM chunks
       |  GROUP BY ch HAVING count(DISTINCT doc_id) >= 2),
       |kept AS (
       |  SELECT c.doc_id, c.s, c.width, c.chunk_str
       |  FROM chunks c LEFT JOIN canon cn ON cn.ch = c.ch
       |  WHERE cn.ch IS NULL OR c.doc_id = cn.canon_doc),
       |agg AS (
       |  SELECT doc_id, CAST(sum(width) AS BIGINT) AS tokens_out,
       |         string_agg(chunk_str, ' ' ORDER BY s) AS text_out
       |  FROM kept GROUP BY 1)
       |SELECT d.doc_id,
       |       CAST(len(string_split(lower(trim(coalesce(d.text, ''))), ' '))
       |            AS BIGINT) AS n_tokens,
       |       CAST(coalesce(a.tokens_out, 0) AS BIGINT) AS tokens_out,
       |       coalesce(a.text_out, '') AS text_out
       |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------- #357 bpe_vocab

  /** #357 bpe_vocab: the SHIPPABLE TOKENIZER ARTIFACT — the symbol
    * inventory after #153's merges, with corpus-weighted occurrence
    * counts: what a tokenizer release actually publishes (vocab.json's
    * content: every live symbol, single characters and merged units,
    * with its frequency over the training vocabulary). #153 ships the
    * merge RULES; this ships the resulting VOCABULARY with usage
    * stats — the table a tokenizer review reads to see which merges
    * carry mass and which are dead weight.
    *
    * Scale shape: replays the trainer's weighted word-vocabulary fold
    * (vocab-sized, per-round lineage cuts — never a corpus pass), then
    * one symbol explode over vocab × word-length and a |symbols|-key
    * rollup. */
  def bpeVocab(s: SparkSession, dir: String,
               steps: Int = TextOps2.BpeSteps): DataFrame = {
    val merges = BpeEncode.trainedMerges(s, dir, steps)
    // the trainers' memoized pinned vocabulary (identical derivation)
    val (words0, _) =
      TextOps2.preparedWords0(TextOps2.baseWords(Tables.documents(s, dir)))
    val fused = merges.zipWithIndex.foldLeft(words0) { case (df, ((a, b), i)) =>
      val next = df.withColumn("w", expr(s"replace(w, '|$a||$b|', '|$a$b|')"))
      if ((i + 1) % 16 == 0) graft.Lineage.cut(next) else next
    }
    fused
      .select(col("freq"),
              explode(expr("split(substring(w, 2, length(w) - 2), '\\\\|\\\\|')"))
                .as("token"))
      .groupBy(col("token"))
      .agg(sum(col("freq")).as("n_occurrences"))
      .withColumn("is_merged", length(col("token")) > 1)
      .select(col("token"), col("n_occurrences"), col("is_merged"))
      .orderBy(col("token"))
  }

  // ------------------------------------------ #360 ts_permutation_entropy

  /** ln(6) at the shared 6dp literal precision — the normalizer for a
    * 3-symbol ordinal alphabet, identical in both engines. */
  private val Ln6 = 1.791759

  /** #360 ts_permutation_entropy: per-series PERMUTATION ENTROPY
    * (Bandt-Pompe 2002, order 3) — the Shannon entropy of the ordinal
    * pattern distribution over consecutive daily-mean triples,
    * normalized to [0, 1] by ln 6. The complexity measure that is
    * invariant to monotone amplitude distortions (unlike #306's
    * spectral entropy, which reads the power spectrum): a trending or
    * rescaled series keeps its PE, so low PE flags genuine temporal
    * regularity and PE ≈ 1 flags white-noise-like dynamics — the
    * cheap per-series "is there structure left after detrending"
    * triage. Ties break by time order (earlier index ranks lower), a
    * strict total order both engines share, so the 6-way CASE is
    * exhaustive and deterministic.
    *
    * Scale shape: the #319 daily basis (per-key rollup), two lead()s
    * on the per-key window, one ≤|series|×6 class rollup, entropy by
    * the #189 6dp-term discipline over the model-sized table. */
  def tsPermutationEntropy(s: SparkSession, dir: String): DataFrame =
    permutationEntropyDf(Mhw.daily(s, dir))

  /** DataFrame-generic core: expects (user_id, d, sst). */
  private[graft] def permutationEntropyDf(dl: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val tr = dl.select(col("user_id"), col("d"), col("sst").as("v1"))
      .withColumn("v2", lead(col("v1"), 1).over(w))
      .withColumn("v3", lead(col("v1"), 2).over(w))
      .filter(col("v3").isNotNull)
    // lexicographic-on-(value, time) strict order: x_i < x_j iff
    // v_i < v_j, or v_i = v_j and i < j — so lt(i,j) for i<j is `<=`
    val lt12 = col("v1") <= col("v2")
    val lt13 = col("v1") <= col("v3")
    val lt23 = col("v2") <= col("v3")
    val cls = when(lt12 && lt23, 0)
      .when(lt12 && !lt23 && lt13, 1)
      .when(lt12 && !lt23 && !lt13, 4)
      .when(!lt12 && lt13, 2)
      .when(!lt12 && !lt13 && lt23, 3)
      .otherwise(5)
    val cnt = tr.select(col("user_id"), cls.as("cls"))
      .groupBy(col("user_id"), col("cls"))
      .agg(count(lit(1)).as("n"))
    val wU = Window.partitionBy(col("user_id"))
    val p = col("n") / sum(col("n")).over(wU)
    val hTerm = when(r(p, 6) > 0,
      r(-r(p, 6) * r(log(r(p, 6)), 6), 6)).otherwise(lit(0.0))
    cnt
      .withColumn("h_term", hTerm)
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_triples"),
           dsum(col("h_term"), 6).as("entropy"))
      .withColumn("pe_norm", r(col("entropy") / Ln6, 6))
      .select(col("user_id"), col("n_triples"), col("entropy"),
              col("pe_norm"))
      .orderBy(col("user_id"))
  }

  /** #362's finalize: rebuild the daily means from the drained
    * per-(user, day) moment registers with the shared 6dp rounding,
    * then the whole #360 ordinal-pattern chain. Bit-identical to batch
    * because Mhw.daily's sst is the same r6(decimal sum / count); no
    * pin needed — the chain reads the daily table once (leads + one
    * rollup), never self-joining. */
  private[graft] def permutationEntropyFinalize(regs: DataFrame): DataFrame =
    permutationEntropyDf(regs.select(col("user_id"), col("d"),
      r(col("sv") / col("cnt"), 6).as("sst")))

  def tsPermutationEntropySql: String = {
    val cse =
      """CASE WHEN v1 <= v2 AND v2 <= v3 THEN 0
        |            WHEN v1 <= v2 AND NOT v2 <= v3 AND v1 <= v3 THEN 1
        |            WHEN v1 <= v2 AND NOT v2 <= v3 AND NOT v1 <= v3 THEN 4
        |            WHEN NOT v1 <= v2 AND v1 <= v3 THEN 2
        |            WHEN NOT v1 <= v2 AND NOT v1 <= v3 AND v2 <= v3 THEN 3
        |            ELSE 5 END""".stripMargin
    val p = "(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY user_id))"
    val hTerm = s"CASE WHEN ${sqlR(p, 6)} > 0 THEN " +
      sqlR(s"-(${sqlR(p, 6)}) * (${sqlR(s"ln(${sqlR(p, 6)})", 6)})", 6) +
      " ELSE 0.0 END"
    s"""WITH dl AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d, ${sqlAvg("value", 6)} AS sst
       |  FROM events GROUP BY 1, 2),
       |tr AS (
       |  SELECT user_id, sst AS v1,
       |         lead(sst, 1) OVER (PARTITION BY user_id ORDER BY d) AS v2,
       |         lead(sst, 2) OVER (PARTITION BY user_id ORDER BY d) AS v3
       |  FROM dl),
       |cnt AS (
       |  SELECT user_id,
       |         $cse AS cls,
       |         count(*) AS n
       |  FROM tr WHERE v3 IS NOT NULL GROUP BY 1, 2),
       |terms AS (
       |  SELECT user_id, n, $hTerm AS h_term FROM cnt)
       |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_triples,
       |       ${sqlR(sqlSum("h_term"), 6)} AS entropy,
       |       ${sqlR(s"(${sqlR(sqlSum("h_term"), 6)}) / $Ln6", 6)} AS pe_norm
       |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------- #358 corpus_bpe_compression_curve

  /** The merge-count grid the compression curve snapshots. */
  val CurveGrid: Seq[Int] = Seq(0, 8, 16, 32, 64)

  /** #358 corpus_bpe_compression_curve: the TOKENIZER-SIZING decision
    * curve — corpus token mass as a function of merge count (snapshots
    * at [[CurveGrid]]): how much compression each block of merges buys,
    * and where returns diminish. #153 trains the rules, #357 ships the
    * vocabulary, this answers "HOW MANY merges" — the axis a tokenizer
    * budget is actually chosen on (chars/token rises toward its
    * asymptote; the elbow is the vocab size worth paying for).
    *
    * Scale shape: one weighted-vocabulary scan, then ONE incremental
    * fold over the memoized merge table (per-round lineage cuts, the
    * trainer discipline) with a 1-row aggregate snapshot at each grid
    * point — 5 vocab-sized jobs, never a corpus pass. */
  def bpeCompressionCurve(s: SparkSession, dir: String,
                          grid: Seq[Int] = CurveGrid): DataFrame = {
    import s.implicits._
    val merges = BpeEncode.trainedMerges(s, dir, grid.max)
    // the trainers' memoized pinned vocabulary (identical derivation)
    var words =
      TextOps2.preparedWords0(TextOps2.baseWords(Tables.documents(s, dir)))._1
    def snapshot(k: Int): (Int, Long, Long, Long) = {
      val row = words.agg(
        sum(col("freq")).as("occ"),
        sum(col("freq") *
          length(regexp_replace(col("w"), "\\|", ""))).as("chars"),
        sum(col("freq") *
          ((length(col("w")) -
            length(regexp_replace(col("w"), "\\|", ""))) / 2).cast("long"))
          .as("toks")).collect()(0)
      (k, row.getLong(0), row.getLong(1), row.getLong(2))
    }
    val snaps = Seq.newBuilder[(Int, Long, Long, Long)]
    if (grid.contains(0)) snaps += snapshot(0)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      words = words.select(
        expr(s"replace(w, '|$a||$b|', '|$a$b|')").as("w"), col("freq"))
      // cut at the grid points the snapshots materialize (≤32 stacked
      // replaces per segment) instead of after every merge — same
      // values, 5 checkpoint layers instead of 64
      if (grid.contains(i + 1)) {
        words = graft.Lineage.cut(words)
        snaps += snapshot(i + 1)
      }
    }
    snaps.result()
      .toDF("n_merges", "n_word_occurrences", "n_chars", "n_tokens")
      .select(col("n_merges"), col("n_word_occurrences"), col("n_chars"),
              col("n_tokens"),
              r(col("n_tokens").cast("double") / col("n_word_occurrences"), 6)
                .as("tokens_per_word"),
              r(col("n_chars").cast("double") / col("n_tokens"), 6)
                .as("chars_per_token"))
      .orderBy(col("n_merges"))
  }

  /** Oracle: the trainer chain already materializes words$k for every
    * round — the curve is a UNION of 1-row aggregates over the grid's
    * snapshots. */
  def bpeCompressionCurveSql(grid: Seq[Int] = CurveGrid): String = {
    val train = TextOps2.bpeTrainMergesSql(grid.max)
      .linesIterator.toSeq
      .takeWhile(l => !l.startsWith("SELECT CAST(")) // keep CTEs, drop readout
      .mkString("\n")
      .stripSuffix("\n")
    val snaps = grid.map { k =>
      s"""SELECT $k AS n_merges,
         |       CAST(sum(freq) AS BIGINT) AS n_word_occurrences,
         |       CAST(sum(freq * length(replace(w, '|', ''))) AS BIGINT)
         |         AS n_chars,
         |       CAST(sum(freq * ((length(w) - length(replace(w, '|', ''))) // 2))
         |         AS BIGINT) AS n_tokens
         |FROM words$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$train,
       |snaps AS (
       |$snaps)
       |SELECT n_merges, n_word_occurrences, n_chars, n_tokens,
       |       ${sqlR("CAST(n_tokens AS DOUBLE) / n_word_occurrences", 6)}
       |         AS tokens_per_word,
       |       ${sqlR("CAST(n_chars AS DOUBLE) / n_tokens", 6)}
       |         AS chars_per_token
       |FROM snaps ORDER BY n_merges""".stripMargin
  }

  /** Oracle: the trainer CTE chain's final words table, symbol explode,
    * weighted rollup. */
  def bpeVocabSql(steps: Int = TextOps2.BpeSteps): String = {
    val train = TextOps2.bpeTrainMergesSql(steps)
      .linesIterator.toSeq
      .takeWhile(l => !l.startsWith("SELECT CAST(")) // keep CTEs, drop readout
      .mkString("\n")
      .stripSuffix("\n")
    s"""$train
       |SELECT token, CAST(sum(freq) AS BIGINT) AS n_occurrences,
       |       length(token) > 1 AS is_merged
       |FROM (
       |  SELECT unnest(string_split(substr(w, 2, length(w) - 2), '||')) AS token,
       |         freq
       |  FROM words$steps)
       |GROUP BY token ORDER BY token""".stripMargin
  }
}
