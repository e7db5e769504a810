package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the BPE trainer rounds (optimization round 12;
  * not part of the driver contract). Compares the per-round cost of
  * the merge loop under different partition postures. */
object ProfBpe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    // warm JIT/codegen once
    t("warmup full loop") {
      graft.operators.TextOps2.bpeTrainMerges(s, dir).count()
    }
    for (rep <- 1 to 2)
      t(s"full loop rep$rep") {
        graft.operators.TextOps2.bpeTrainMerges(s, dir).count()
      }
    // raw per-round anatomy at parts=1: one pair-count collect over the
    // prepared words0, repeated, no merges applied
    val (w0, parts) = graft.operators.TextOps2.preparedWords0(
      graft.operators.TextOps2.baseWords(graft.sources.Tables.documents(s, dir)))
    println(s"parts=$parts nWords=${w0.count()}")
    GraftSession.withShufflePartitions(s, parts) {
      t("30x pairCount collect p=1") {
        for (_ <- 1 to 30) {
          w0.select(col("freq"),
              expr("split(substring(w, 2, length(w) - 2), '\\\\|\\\\|')").as("ss"))
            .filter(size(col("ss")) >= 2)
            .select(col("freq"), expr(
              "explode(transform(sequence(1, size(ss) - 1), " +
              "i -> struct(element_at(ss, i) AS sym_a, element_at(ss, i + 1) AS sym_b)))").as("p"))
            .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
            .agg(sum(col("freq")).as("n"))
            .orderBy(col("n").desc, col("sym_a"), col("sym_b"))
            .limit(1).collect()
        }
      }
    }
    // OLD loop shape: raw 32-partition lazy vocab, session conf, no pin
    def oldLoop(): Unit = {
      var words = graft.sources.Tables.documents(s, dir)
        .select(explode(graft.functions.TextFunctions.lowerTokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2 && col("w").rlike("^[a-z]+$"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .select(regexp_replace(col("w"), "(.)", "|$1|").as("w"), col("freq"))
      for (_ <- 1 to 64) {
        val win = words
          .select(col("freq"),
                  expr("split(substring(w, 2, length(w) - 2), '\\\\|\\\\|')").as("ss"))
          .filter(size(col("ss")) >= 2)
          .select(col("freq"), expr(
            "explode(transform(sequence(1, size(ss) - 1), " +
            "i -> struct(element_at(ss, i) AS sym_a, element_at(ss, i + 1) AS sym_b)))").as("p"))
          .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("sym_a"), col("sym_b"))
          .limit(1).collect()
        if (win.nonEmpty) {
          val (a, b) = (win(0).getString(0), win(0).getString(1))
          words = words.select(
            expr(s"replace(w, '|$a||$b|', '|$a$b|')").as("w"), col("freq"))
          words = graft.Lineage.cut(words)
        }
      }
    }
    t("old loop warm")(oldLoop())
    for (rep <- 1 to 2) t(s"old loop rep$rep")(oldLoop())
    def withConf[A](k: String, v: String)(body: => A): A = {
      val old = s.conf.get(k); s.conf.set(k, v)
      try body finally s.conf.set(k, old)
    }
    withConf("spark.sql.adaptive.enabled", "false") {
      t("warm new loop AQE-off") {
        graft.operators.TextOps2.bpeTrainMerges(s, dir).count()
      }
      for (rep <- 1 to 2)
        t(s"new loop AQE-off rep$rep") {
          graft.operators.TextOps2.bpeTrainMerges(s, dir).count()
        }
      t("old loop AQE-off")(oldLoop())
    }
    GraftSession.withShufflePartitions(s, 32) {
      val w32 = w0.repartition(32).localCheckpoint()
      t("30x pairCount collect p=32") {
        for (_ <- 1 to 30) {
          w32.select(col("freq"),
              expr("split(substring(w, 2, length(w) - 2), '\\\\|\\\\|')").as("ss"))
            .filter(size(col("ss")) >= 2)
            .select(col("freq"), expr(
              "explode(transform(sequence(1, size(ss) - 1), " +
              "i -> struct(element_at(ss, i) AS sym_a, element_at(ss, i + 1) AS sym_b)))").as("p"))
            .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
            .agg(sum(col("freq")).as("n"))
            .orderBy(col("n").desc, col("sym_a"), col("sym_b"))
            .limit(1).collect()
        }
      }
    }
    s.stop()
  }
}
