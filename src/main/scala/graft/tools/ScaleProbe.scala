package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.core.Sessions

/** Empirical next-decade scaling probe (VERDICT r9 stretch 7): builds
  * a 10× replica of the largest shipped testdata scale (sf0.1) and
  * times the most expensive catalog queries SINGLE-PASS at both
  * scales, recording the ratio per query to `BENCH_SCALE.json`. The
  * point is the check no small-SF bench can give: nothing in the
  * catalog silently goes quadratic one decade past the gate scale —
  * a ~O(n) query lands near 10×, O(n log n) a bit above, and anything
  * far beyond the `flagFactor` (15×) is flagged for a PLANS.md note
  * or a fix.
  *
  * Replica construction (honesty notes — this is a TIMING probe, the
  * correctness gate stays at real driver data):
  *  - every entity key (orderkey, custkey, suppkey, partkey, doc_id,
  *    vec_id, event_id, user_id) shifts by replica · 10¹¹, applied
  *    CONSISTENTLY across fact/dim tables, so joins hit exactly as at
  *    base scale and the replicas are 10 disjoint copies of the same
  *    distribution (graphs become 10 disjoint components — iteration
  *    counts hold, frontiers scale linearly);
  *  - document TOKENS are suffixed with the replica id (token → to
  *    `token<k>`), so cross-replica Jaccard/MinHash/SimHash/boiler-
  *    plate similarity is zero and the near-dup RATE stays what the
  *    base corpus has — replicating text verbatim would square the
  *    candidate-pair count and falsely flag dedup as quadratic;
  *    n_chars is recomputed from the salted text;
  *  - embeddings ROTATE by replica (dim i ← dim (i+k) mod d), which
  *    decorrelates cross-replica cosine for the same reason;
  *  - dates, languages, sources, event types, values are untouched —
  *    the probe grows ROWS, not ranges, which is what a bigger crawl
  *    does (note: per-DAY series lengths therefore do not grow, so
  *    period-bounded trend operators are EXPECTED to land well under
  *    10× — that sublinearity is the design, not a miss).
  */
object ScaleProbe {

  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Single-pass wall seconds for one catalog query against `dir`. */
  private def time1(
      spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    force(SparkEntry.queries(name)(spark, dir))
    (System.nanoTime() - t0) / 1e9
  }

  /** The r9/r10 bench's most expensive queries (two-pass minima
    * order) — the set worth probing a decade up. Overridable via
    * args. */
  val DefaultProbes: Seq[String] = Seq(
    "q_graph_hits", "q_trend_siegel", "q_graph_pagerank", "q_graph_ppr",
    "q_trend_theilsen", "q_graph_kcore", "q_corpus_report",
    "q_conformal", "q_graph_jaccard", "q_cluster_inertia", "q_profile",
    "q_stream_join", "q_markov_steady", "q_lake_merge", "q_events_rfm",
    "q_join_salted", "q_graph_linkpred", "q_profile_approx",
    "q_text_boilerplate", "q_join_bucketed", "q_sketch_intersect",
    "q_fdr_bh", "q_text_transfer", "q_stream_ewma", "q_lake_delete",
    // round 11 entrants into the top costs
    "q_trend_siegel_sampled", "q_cvm_test", "q_graph_richclub",
    "q_stream_quantile_group", "q_stream_f2",
    // round 12 entrants
    "q_stream_joinsize", "q_stream_dsir", "q_sketch_hll",
    "q_graph_harmonic", "q_embedding_twonn",
    // round 13 entrants
    "q_graph_ktruss", "q_graph_clustering", "q_trend_hurst",
    "q_sample_pps", "q_sim_mips", "q_trend_ph", "q_quality_isotonic",
    // round 14 entrants
    "q_sim_mips_lsh", "q_sim_mips_recall", "q_cluster_silhouette",
    "q_embedding_jl", "q_stream_hurst", "q_stream_isotonic",
    "q_wilcoxon_signed", "q_embedding_mmd", "q_text_feature_hash",
    "q_graph_betweenness", "q_quality_ece", "q_stream_mmd",
    // round 15 entrants
    "q_sim_mips_ivf", "q_embedding_cka", "q_stream_cusum",
    "q_stream_mk", "q_graph_eccentricity", "q_pareto_front",
    "q_corr_partial", "q_quality_spiegelhalter",
    "q_events_markov_entropy", "q_token_heaps", "q_stream_pareto",
    "q_stream_spiegelhalter", "q_stream_hosmer")

  private val Shift = 100000000000L // 10^11: far above any base key

  /** Replicate `factor`× with consistent key shifts + content
    * decorrelation; k = 0 is the identity replica. */
  private def build(
      spark: SparkSession, base: String, out: String, factor: Int): Unit = {
    // the driver testdata ships each table as a single FILE named
    // <table>.parquet (the streaming sources glob on that name), so
    // the replica must too: write a one-part dir, then promote the
    // part file to <table>.parquet
    def writeFile(df: DataFrame, table: String): Unit = {
      val stage = s"$out/_build_$table"
      // small row groups (8 MB vs the 128 MB default): coalesce(1)
      // with the default produced ONE row group per file — a single
      // task then decodes the whole 10x table (parquet splits at row-
      // group granularity), serializing every probe's scan phase and
      // inflating all x10 ratios by the lost parallelism. ~20 groups
      // per replica file restore the multi-task scan a real
      // multi-file layout would have.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 8L * 1024 * 1024)
        .parquet(stage)
      val dir = Paths.get(stage)
      val part = Files.list(dir).filter(_.getFileName.toString
        .endsWith(".parquet")).findFirst().get()
      Files.createDirectories(Paths.get(out))
      Files.move(part, Paths.get(s"$out/$table.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.list(dir).forEach(p => Files.delete(p))
      Files.delete(dir)
    }
    def reps(table: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$base/$table.parquet")
      val all = (0 until factor).map(k => f(src, k))
        .reduce(_ unionByName _)
      writeFile(all, table)
      println(s"[scale] built $table x$factor")
    }
    def shifted(c: String, k: Int) = col(c) + lit(k.toLong * Shift)
    reps("customer")((df, k) =>
      df.withColumn("c_custkey", shifted("c_custkey", k)))
    reps("supplier")((df, k) =>
      df.withColumn("s_suppkey", shifted("s_suppkey", k)))
    reps("part")((df, k) =>
      df.withColumn("p_partkey", shifted("p_partkey", k)))
    reps("orders")((df, k) => df
      .withColumn("o_orderkey", shifted("o_orderkey", k))
      .withColumn("o_custkey", shifted("o_custkey", k)))
    reps("lineitem")((df, k) => df
      .withColumn("l_orderkey", shifted("l_orderkey", k))
      .withColumn("l_partkey", shifted("l_partkey", k))
      .withColumn("l_suppkey", shifted("l_suppkey", k)))
    reps("events")((df, k) => df
      .withColumn("event_id", shifted("event_id", k))
      .withColumn("user_id", shifted("user_id", k)))
    reps("documents")((df, k) => {
      val salted = if (k == 0) df else df.withColumn("text",
        regexp_replace(col("text"), "(\\p{L}+)", "$1" + k.toString))
      salted
        .withColumn("doc_id", shifted("doc_id", k))
        .withColumn("n_chars", length(col("text")))
    })
    reps("embeddings")((df, k) => {
      val rotated = if (k == 0) df else df.withColumn("embedding",
        expr(s"transform(embedding, (x, i) -> " +
          s"element_at(embedding, ((i + $k) % size(embedding)) + 1))"))
      rotated.withColumn("vec_id", shifted("vec_id", k))
    })
    Seq("region", "nation").foreach { t =>
      writeFile(spark.read.parquet(s"$base/$t.parquet"), t)
    }
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SCALE_DIR", "tmp/sfx10")
    val factor = 10
    // 12×, not 15 (VERDICT r11 item 3): a 14× quadratic hid under the
    // old bound; anything past ~n·log-n territory should surface
    val flagFactor = 12.0
    val probes =
      if (args.nonEmpty) args.toSeq.filter(SparkEntry.queries.contains)
      else DefaultProbes
    val spark = Sessions.local("graft-scale")

    if (!Files.exists(Paths.get(s"$out/embeddings.parquet"))) {
      println(s"[scale] building $factor x $base -> $out")
      build(spark, base, out, factor)
    } else println(s"[scale] reusing $out")

    // warm-up on each dir so codegen/scan setup lands outside timings
    force(SparkEntry.queries("q_agg_pricing")(spark, base))
    force(SparkEntry.queries("q_agg_pricing")(spark, out))

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def measure(name: String): Option[(String, Double, Double, Double)] =
      try {
        val tb = time1(spark, name, base)
        val tx = time1(spark, name, out)
        val ratio = tx / math.max(tb, 1e-9)
        Some((name, tb, tx, ratio))
      } catch {
        case e: Throwable =>
          println(s"[scale] $name FAILED: ${e.getMessage}")
          None
      }
    // (name, base, x10, keptRatio, firstRatioIfRetried)
    val results = probes.flatMap { name =>
      // a long sequential session accumulates executor pressure that
      // can produce a phantom 50x on one unlucky query (r11: a 65x
      // q_join_salted that re-measured at 2.2x in isolation) — give
      // any over-threshold measurement ONE retry and keep the better
      // ratio, the bench's min-of-retries idiom. BOTH measurements go
      // to the artifact (ADVICE r11): a retry-cleared flag stays
      // auditable instead of silently reading as clean.
      val first = measure(name)
      val kept: Option[(String, Double, Double, Double, Option[Double])] =
        first match {
          case Some(m) if m._4 > flagFactor =>
            println(s"[scale] ${m._1} ratio=${fmt(m._4)} over " +
              s"$flagFactor - retrying once")
            val retry = measure(name)
            val best = retry.filter(_._4 < m._4).getOrElse(m)
            Some((best._1, best._2, best._3, best._4, Some(m._4)))
          case other => other.map(m => (m._1, m._2, m._3, m._4, None))
        }
      kept.foreach { case (n, tb, tx, ratio, firstR) =>
        println(s"[scale] $n base=${fmt(tb)}s x$factor=${fmt(tx)}s " +
          s"ratio=${fmt(ratio)}" +
          firstR.map(f => s" (first=${fmt(f)})").getOrElse(""))
      }
      kept
    }
    // AUTOMATIC SOLO RE-MEASURE (VERDICT r13 item 3, the recorded
    // measurement-discipline rule made driver-visible): a long
    // sequential session co-schedules 40+ probes, and executor
    // pressure alone has produced 3-4× phantom ratios that re-measure
    // well under 3× in isolation (r12/r13 PLANS audits, done by hand
    // twice). Any query whose full-session ratio exceeds soloFactor
    // gets an automatic re-run in a FRESH SparkSession (memos cold —
    // the solo cost includes any shared-pass build, exactly like the
    // manual single-query procedure), and the artifact carries BOTH
    // numbers. Only a ratio that survives the solo re-measure is an
    // operator problem.
    // the flagged filter below relies on every over-flagFactor query
    // having a solo entry, which holds only while flagFactor >=
    // soloFactor (ADVICE r14) — pin the invariant
    val soloFactor = math.min(3.0, flagFactor)
    val soloNames = results.filter(_._4 > soloFactor).map(_._1)
    if (soloNames.nonEmpty) {
      spark.stop()
      // settle: the stopped sweep session's executor threads, GC and
      // page-cache churn linger for seconds — r14's automated solo
      // read 3.99x on q_sketch_intersect immediately after the sweep
      // where three idle-machine solos read 1.23-1.30x (attribution
      // in PLANS.md round 15)
      Thread.sleep(10000)
    }
    val solo: Map[String, Double] = soloNames.flatMap { name =>
      val s2 = Sessions.local(s"graft-scale-solo")
      // a solo failure must not sink the sweep's 40+ measurements —
      // the query keeps only its full-session ratio (conservative:
      // still near-flagged, still flaggable).
      // MIN-OF-2: one co-scheduled hiccup must not stick to the
      // recorded solo number (the bench min-of-retries idiom).
      try {
        force(SparkEntry.queries("q_agg_pricing")(s2, base))
        force(SparkEntry.queries("q_agg_pricing")(s2, out))
        val r = (1 to 2).map { _ =>
          val tb = time1(s2, name, base)
          val tx = time1(s2, name, out)
          val r1 = tx / math.max(tb, 1e-9)
          println(s"[scale] $name SOLO base=${fmt(tb)}s x$factor=" +
            s"${fmt(tx)}s ratio=${fmt(r1)}")
          r1
        }.min
        Some(name -> r)
      } catch {
        case e: Throwable =>
          println(s"[scale] $name SOLO FAILED: ${e.getMessage}")
          None
      } finally s2.stop()
    }.toMap
    // a query is FLAGGED only when the solo re-measure (always taken
    // for anything over soloFactor, hence for anything over
    // flagFactor) also exceeds the bound
    val flagged = results
      .filter(r => r._4 > flagFactor &&
        solo.getOrElse(r._1, r._4) > flagFactor)
      .map(_._1)
    def entry(name: String, full: Double): String =
      // "ratio" stays as a compatibility alias of "ratio_full" for
      // pre-r14 consumers of the near_flag schema (ADVICE r14)
      s"""{"query":"$name","ratio":${fmt(full)},""" +
        s""""ratio_full":${fmt(full)}""" +
        solo.get(name).map(s => s""","ratio_solo":${fmt(s)}""")
          .getOrElse("") + "}"
    // every solo-re-measured query is a near-flag entry, plus the
    // top-3 full ratios (VERDICT r11 item 3): a near-miss under the
    // bound must never read as clean
    val nearNames = (soloNames ++
      results.sortBy(-_._4).take(3).map(_._1)).distinct
    val fullByName = results.map(r => r._1 -> r._4).toMap
    val nearFlag = nearNames
      .sortBy(n => -fullByName.getOrElse(n, 0.0))
      .map(n => entry(n, fullByName(n)))
    val qs = results.map { case (n, tb, tx, r, firstR) =>
      s""""$n":{"base_sec":${fmt(tb)},"x10_sec":${fmt(tx)},""" +
        s""""ratio":${fmt(r)}""" +
        firstR.map(f => s""","first_try_ratio":${fmt(f)}""").getOrElse("") +
        solo.get(n).map(s => s""","ratio_solo":${fmt(s)}""").getOrElse("") +
        "}"
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale_probe","rows_factor":$factor,""" +
        s""""base":"$base","scaled":"$out","flag_factor":$flagFactor,""" +
        s""""solo_factor":$soloFactor,""" +
        s""""flagged":${flagged.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""near_flag":${nearFlag.mkString("[", ",", "]")},""" +
        s""""queries":$qs}"""
    Files.writeString(Paths.get("BENCH_SCALE.json"), json + "\n")
    println(s"GRAFT_SCALE_JSON $json")
    if (soloNames.isEmpty) spark.stop()
  }
}
