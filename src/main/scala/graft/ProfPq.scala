package graft

import graft.operators.SimilarityPq
import graft.sources.Tables

/** ann_pq stage profiler (round-8 verdict task 1 — "profile before
  * patching"). Findings at sf0.1 (2000 vectors, steady-state, this
  * host):
  *
  *   train iters=2   ~1.3-1.5 s   (two sequential Lloyd collect jobs)
  *   encode count     ~0.1 s      (map-only argmax literals)
  *   full annPq      ~2.3-2.6 s   (was 3.40 s in BENCH_r07)
  *
  * The Lloyd update aggregation alone costs ~0.6-0.8 s per round and is
  * INVARIANT to shuffle partitions (32→4), AQE on/off, and decimal-vs-
  * double aggregation — i.e. it is fixed multi-stage job latency on a
  * 2000-row corpus, not data cost or plan shape. With the round-8
  * map-only ADC rewrite (literal-LUT element_at sums, no
  * queries×corpus shuffle) the residual wall time is genuinely the two
  * codebook-training scans, which at real scale are bounded partial-agg
  * passes — the correct 100 TB shape. Item closed as inherent.
  */
object ProfPq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }
    t("warm corpus scan") { Tables.embeddings(spark, dir).count() }
    t("warm annPq full") { SimilarityPq.annPq(spark, dir).count() }
    val corpus = graft.Lineage.pin(Tables.embeddings(spark, dir))
    (1 to 2).foreach { rep =>
      t(s"train iters=2 rep$rep") { SimilarityPq.trainCodebooks(corpus, 2); 0L }
      t(s"train iters=1 rep$rep") { SimilarityPq.trainCodebooks(corpus, 1); 0L }
      t(s"train iters=0 rep$rep") { SimilarityPq.trainCodebooks(corpus, 0); 0L }
      val cb = SimilarityPq.trainCodebooks(corpus, 2)
      t(s"encode count rep$rep") { SimilarityPq.withCodes(corpus, cb).count() }
      t(s"annPq full rep$rep") { SimilarityPq.annPq(spark, dir).count() }
    }
    spark.stop()
  }
}
