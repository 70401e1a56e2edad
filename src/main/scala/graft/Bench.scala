package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Sessions

/** Benchmark harness: times every catalog query on
  * SPARK_GRAFT_SF_DIR and emits ONE machine-readable JSON line.
  *
  * Honesty rules (VERDICT r1 "What's wrong" #2/#3):
  *  - the JSON is written to the BENCH_OUT file (if set) AND printed
  *    with a unique `GRAFT_BENCH_JSON ` prefix plus bare, so the driver
  *    can find it under sbt log noise;
  *  - failures are not swallowed: a failed query reports its error
  *    string and the total is marked degraded (errors object);
  *  - each query is forced with a `noop`-format write, not `count()`,
  *    so Catalyst cannot prune computed columns out of the measurement;
  *  - one warm-up query absorbs JVM/codegen warm-up before timing.
  */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Cluster-wide data-movement counters, accumulated from completed
    * stages. WHY: wall-clock in the driver artifact has twice been
    * poisoned by external machine load (BENCH_r07 recorded 2.5-3x
    * inflation); BYTES are load-invariant, so per-query shuffle and
    * spill deltas give the cross-round record a regression signal
    * that a busy box cannot fake or hide. (Scan input bytes are NOT
    * reported: taskMetrics.inputMetrics stays near zero on this
    * local-parquet read path, and a misleading zero column is worse
    * than none — scan-width regressions are caught by the PLANS.md
    * pruned-scan audit instead.) */
  private final class ByteMetrics
      extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new AtomicLong
    val spill = new AtomicLong
    override def onTaskEnd(
        ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = ev.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
    def snapshot: (Long, Long) = (shuffleWrite.get, spill.get)
  }

  /** Drain the async listener bus so stage metrics posted for the
    * just-finished query are attributed to it, not the next one.
    * `listenerBus` is private[spark] (bytecode-public), hence
    * reflection — the same access pattern the public spark-testing-base
    * library uses; falls back to a short sleep if the internals move. */
  private def flushListeners(sc: org.apache.spark.SparkContext): Unit =
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" &&
          m.getParameterCount == 0) match {
        case Some(m) => m.invoke(bus)
        case None => bus.getClass
          .getMethod("waitUntilEmpty", java.lang.Long.TYPE)
          .invoke(bus, java.lang.Long.valueOf(10000L))
      }
    } catch { case _: Throwable => Thread.sleep(200) }

  /** Locale-pinned decimal formatting: the digest is parsed as JSON by
    * the driver, and default-locale "%.2f" emits decimal commas under
    * e.g. de_DE. */
  private def fmt(pattern: String, v: Double): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(v))

  /** 1-minute system load average from /proc/loadavg (-1.0 where the
    * proc fs is unavailable). WHY (VERDICT r9 item 2): BENCH_r07 and
    * BENCH_r09 both recorded external machine load as query time; a
    * per-rep load sample IN the artifact lets the reader see the
    * contention instead of re-adjudicating phantom regressions from a
    * separate idle-box run. */
  private def loadAvg(): Double =
    try Files.readString(Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Machine-wide (user+nice+system, idle+iowait) jiffy counters from
    * the aggregate `cpu ` line of /proc/stat. WHY (VERDICT r15 item
    * 1): three rounds of driver-bench totals (225 → 327 → 455 s) were
    * attributed to "a busy machine" from loadavg alone — a 1-minute
    * EMA that lags the query it is sampled next to. The busy/total
    * jiffy DELTA across a query's own wall-clock window is the direct
    * measurement: busy fraction ≈ cores-in-use / cores, sampled over
    * exactly the interval being timed, so a slow rep under external
    * contention carries its own evidence in the artifact. */
  private def cpuJiffies(): (Long, Long, Long) =
    try {
      val cols = Files.readString(Paths.get("/proc/stat"))
        .linesIterator.next().trim.split("\\s+")
      // cpu user nice system idle iowait irq softirq steal ...
      val v = cols.drop(1).map(_.toLong)
      val busy = v(0) + v(1) + v(2)
      val total = v.take(8).sum
      // STEAL (round 17): on a virtualized box the hypervisor can
      // starve the guest — wall-clock stretches while the guest's
      // busy fraction COLLAPSES (the r17 W1 run: a query at 3% busy
      // for 11.8 s that runs in 0.9 s on the same box minutes later).
      // The steal delta over a rep's own window makes that poisoning
      // self-evident in the artifact instead of needing a re-run.
      val steal = if (v.length > 7) v(7) else -1L
      (busy, steal, total)
    } catch { case _: Throwable => (-1L, -1L, -1L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")

    // Optional args = regexes; run only matching queries (iteration aid
    // — the driver passes no args and times the full catalog).
    // `--repeat N` times each query N times and reports the MINIMUM —
    // the variance/warm-up separator: codegen + JIT warm-up dominates
    // rep 1 at small SF, so back-to-back runs that disagree on rep-1
    // time but agree on min are noise, not regressions (PLANS.md
    // "Bench variance").
    //
    // The driver's artifact invocation (no args) DEFAULTS to two passes:
    // BENCH_r07 recorded external machine load as query time (497.9 s
    // for a catalog that runs in 157–200 s on an idle box — VERDICT r7
    // Performance). Per-query minima over two passes strip transient
    // load spikes and one-time shared-memo builds; both pass totals are
    // emitted so a loaded run is self-evident in the artifact itself.
    val (repeatArg, filters) = {
      val i = args.indexOf("--repeat")
      if (i >= 0) {
        require(i + 1 < args.length,
          "--repeat requires a count argument (e.g. --repeat 3)")
        (Some(args(i + 1).toInt.max(1)), args.patch(i, Nil, 2).toSeq)
      } else (None, args.toSeq)
    }
    val repeat = repeatArg.getOrElse(if (filters.isEmpty) 2 else 1)
    val selected =
      if (filters.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) =>
        filters.exists(a => n.matches(a) || n.contains(a))
      }

    // Warm-up: a representative scan+shuffle, untimed.
    try force(SparkEntry.queries("q_agg_pricing")(spark, sfDir))
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }

    // Byte counters start AFTER warm-up so its IO isn't attributed to
    // the first query.
    val bytes = new ByteMetrics
    spark.sparkContext.addSparkListener(bytes)

    // Per rep: (seconds, error, (shuffleWrite, spill) byte deltas,
    // loadavg sampled at rep start, machine busy-CPU fraction over
    // the rep's own wall-clock window).
    def runRep(fn: (SparkSession, String) => DataFrame):
        (Double, Option[String], (Long, Long), Double, Double,
            Double) = {
      val load = loadAvg()
      val (cb0, cs0, ct0) = cpuJiffies()
      val (sw0, sp0) = bytes.snapshot
      val t0 = System.nanoTime()
      val err =
        try { force(fn(spark, sfDir)); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      val (cb1, cs1, ct1) = cpuJiffies()
      flushListeners(spark.sparkContext)
      val (sw1, sp1) = bytes.snapshot
      val busy =
        if (cb0 < 0 || cb1 < 0 || ct1 <= ct0) -1.0
        else (cb1 - cb0).toDouble / (ct1 - ct0)
      val steal =
        if (cs0 < 0 || cs1 < 0 || ct1 <= ct0) -1.0
        else (cs1 - cs0).toDouble / (ct1 - ct0)
      (sec, err, (sw1 - sw0, sp1 - sp0), load, busy, steal)
    }
    val timedPasses = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        var reps = (1 to repeat).map(_ => runRep(fn))
        // Load-robustness (VERDICT r9 item 2): when the two passes
        // disagree by >3x, one of them caught a transient (external
        // load, a shared-memo build) — take a THIRD rep so the
        // published minimum is a min-of-3, not a coin flip between a
        // clean and a poisoned measurement.
        if (repeat >= 2) {
          val ok = reps.collect { case (t, None, _, _, _, _) => t }
          if (ok.size >= 2 && ok.max > 3.0 * ok.min) reps :+= runRep(fn)
        }
        (name, reps)
    }
    // Contention-aware tie-break (VERDICT r16 item 5): the 3x rule
    // above misses the case where BOTH passes of a query were poisoned
    // by external load (r16's q_dedup_ngram — passes agreed at ~6x the
    // idle-box time). The published (min) rep carries its own busy-CPU
    // fraction; a min whose busy is far above the run's median says
    // "even the best rep ran on a busy machine", so it earns one more
    // rep. Calibration on an idle-box baseline: busy_q includes the
    // query's OWN parallelism, so genuinely-parallel queries sit at
    // 3-6x the median legitimately (62 of 399 exceed 2x median on an
    // idle box) — the rule therefore triggers at >3x median AND caps
    // the extra reps at the 15 largest published times, bounding the
    // extra pass at a few percent of the run while covering every
    // query whose poisoning could move the total. Additions-only: reps
    // can only be appended, the published value is still the min over
    // successful reps.
    val timed = if (repeat < 2) timedPasses else {
      val minOk = timedPasses.flatMap { case (_, reps) =>
        reps.collect { case r @ (_, None, _, _, _, _) => r }
          .sortBy(_._1).headOption
      }
      val busies = minOk.map(_._5).filter(_ >= 0).sorted
      if (busies.isEmpty) timedPasses
      else {
        val med = busies(busies.size / 2)
        val suspect = timedPasses.filter { case (_, reps) =>
          val ok = reps.collect { case r @ (_, None, _, _, _, _) => r }
          ok.nonEmpty && {
            val best = ok.minBy(_._1)
            best._5 >= 0 && med >= 0 && best._5 > 3.0 * med
          }
        }.sortBy { case (_, reps) =>
          -reps.collect { case (t, None, _, _, _, _) => t }.min
        }.take(15).map(_._1).toSet
        timedPasses.map { case (name, reps) =>
          if (suspect(name)) (name, reps :+ runRep(selected(name)))
          else (name, reps)
        }
      }
    }
    // Queries the contention rule re-ran (subset of retried_queries
    // unless the 3x rule already fired for them).
    val busyRetried = timed.zip(timedPasses).collect {
      case ((name, now), (_, before)) if now.size > before.size => name
    }
    val results = timed.map { case (name, reps) =>
      // No harness-level cache clearing: operators own and release
      // their corpus-scale input caches (Dedup.ownResult); what stays
      // cached across queries is only tiny, explicitly-shared result
      // frames (the dedup pair set q_dedup_apply reuses — its cost is
      // attributed to whichever dedup query runs first; see memoTagged
      // below for the full map).
      // min over SUCCESSFUL reps only (a fast failure is not a
      // timing); a query errors only when every rep failed. Bytes come
      // from the LAST rep — steady state, shared memos already built,
      // so cross-round byte diffs compare plans, not cache luck.
      // loadavg + busy-CPU fraction come from the PUBLISHED (min) rep
      // (VERDICT r15 item 1): the published total is the sum of
      // minima, so a contended minimum — the case where even the best
      // rep was poisoned — is self-evident per query in the artifact.
      val ok = reps.collect { case r @ (_, None, _, _, _, _) => r }
      if (ok.nonEmpty) {
        val best = ok.minBy(_._1)
        (name, best._1, None, reps.last._3, best._4, best._5, best._6)
      } else
        (name, reps.map(_._1).min, reps.flatMap(_._2).headOption,
          reps.last._3, reps.head._4, reps.head._5, reps.head._6)
    }
    // Per-pass totals: pass k = sum of every query's k-th rep. Under
    // external load the passes disagree (and both exceed the minima
    // total); on an idle box pass 2 ≈ the minima total.
    val passTotals = (0 until repeat).map { k =>
      timed.map { case (_, reps) => reps(k)._1 }.sum
    }
    // Per-pass mean loadavg (sampled at each query's k-th rep start)
    // + the run's max: the contention record that explains a slow
    // pass without a second idle-box run (VERDICT r9 item 2).
    val passLoads = (0 until repeat).map { k =>
      val ls = timed.map { case (_, reps) => reps(k)._4 }.filter(_ >= 0)
      if (ls.isEmpty) -1.0 else ls.sum / ls.size
    }
    val loadMax = {
      val ls = timed.flatMap(_._2.map(_._4)).filter(_ >= 0)
      if (ls.isEmpty) -1.0 else ls.max
    }
    // Per-pass TIME-WEIGHTED busy-CPU fraction (each query's k-th rep
    // busy fraction weighted by that rep's wall-clock): the direct
    // "was the machine busy during this pass" number that loadavg
    // only proxies. An idle-box pass on local[32] typically reads the
    // bench's own utilization; a pass whose busy fraction is much
    // higher than its twin's explains its slower total by itself
    // (VERDICT r15 item 1).
    val passBusy = (0 until repeat).map { k =>
      val rs = timed.map { case (_, reps) => reps(k) }
        .filter(_._5 >= 0)
      val w = rs.map(_._1).sum
      if (w <= 0) -1.0 else rs.map(r => r._1 * r._5).sum / w
    }
    // Per-pass time-weighted STEAL fraction (round 17): hypervisor
    // CPU theft over each pass — the direct signature of a starved
    // guest (wall stretches, busy collapses, steal spikes).
    val passSteal = (0 until repeat).map { k =>
      val rs = timed.map { case (_, reps) => reps(k) }
        .filter(_._6 >= 0)
      val w = rs.map(_._1).sum
      if (w <= 0) -1.0 else rs.map(r => r._1 * r._6).sum / w
    }
    // Queries that earned a third (tie-break) rep this run.
    val retried = timed.collect {
      case (name, reps) if reps.size > repeat => name
    }
    // Queries whose first timed rep may include a one-time shared-memo
    // build (Queries.scala pairMemo/ccMemo/pcaMemo/bpeMemo/knnMemo/
    // clusterMemo): the build lands on whichever consumer runs first in
    // a given bench ordering, so cross-round diffs on these queries
    // should compare minima, not single-shot times.
    val memoTagged = Seq(
      "q_dedup_minhash_pairs", "q_dedup_apply", "q_dedup_components",
      "q_dedup_apply_cc", "q_dedup_cluster_census",
      "q_graph_triangles", "q_graph_bfs", "q_graph_components",
      "q_graph_linkpred", "q_cluster_balance", "q_cluster_purity",
      "q_embedding_pca", "q_embedding_whiten",
      "q_bpe_merges", "q_bpe_encode")
      .filter(selected.contains)

    def jstr(s: String): String = graft.core.Jsons.str(s)
    val qs = results
      .map { case (k, v, _, _, _, _, _) =>
        s"${jstr(k)}:${fmt("%.4f", v)}" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _, _, _, _) =>
      s"${jstr(k)}:${jstr(e.take(300))}"
    }.mkString("{", ",", "}")
    // Load-invariant per-query data movement (MB, steady-state rep):
    // the numbers to regress on when wall-clock is suspect.
    def mb(b: Long): String = fmt("%.2f", b / 1e6)
    def byteMap(pick: ((Long, Long)) => Long): String = results
      .map { case (k, _, _, d, _, _, _) =>
        s"${jstr(k)}:${mb(pick(d))}" }
      .mkString("{", ",", "}")
    val shuffleMb = byteMap(_._1)
    val spillMb = byteMap(_._2)
    // Per-query contention record for the PUBLISHED rep (VERDICT r15
    // item 1): `load_q` = 1-min loadavg at that rep's start, `busy_q`
    // = machine busy-CPU fraction over exactly that rep's window. A
    // cross-round per-query regression whose busy_q also jumped is
    // environment; one whose busy_q held steady is a plan change.
    val loadQ = results
      .map { case (k, _, _, _, l, _, _) =>
        s"${jstr(k)}:${fmt("%.2f", l)}" }
      .mkString("{", ",", "}")
    val busyQ = results
      .map { case (k, _, _, _, _, b, _) =>
        s"${jstr(k)}:${fmt("%.3f", b)}" }
      .mkString("{", ",", "}")
    val stealQ = results
      .map { case (k, _, _, _, _, _, st) =>
        s"${jstr(k)}:${fmt("%.3f", st)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val shuffleTotalMb = results.map(_._4._1).sum / 1e6
    val spillTotalMb = results.map(_._4._2).sum / 1e6
    val passes = passTotals.map(fmt("%.2f", _)).mkString("[", ",", "]")
    val loads = passLoads.map(fmt("%.2f", _)).mkString("[", ",", "]")
    val busies = passBusy.map(fmt("%.3f", _)).mkString("[", ",", "]")
    val steals = passSteal.map(fmt("%.3f", _)).mkString("[", ",", "]")
    val retr = retried.map(jstr).mkString("[", ",", "]")
    val busyRetr = busyRetried.map(jstr).mkString("[", ",", "]")
    val memo = memoTagged.map(jstr).mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${fmt("%.4f", total)},"unit":"sec",""" +
        s""""repeat":$repeat,"pass_totals":$passes,""" +
        s""""loadavg_per_pass":$loads,""" +
        s""""loadavg_max":${fmt("%.2f", loadMax)},""" +
        s""""cpu_busy_per_pass":$busies,""" +
        s""""cpu_steal_per_pass":$steals,""" +
        s""""retried_queries":$retr,"busy_retried":$busyRetr,""" +
        s""""memo_queries":$memo,""" +
        s""""shuffle_total_mb":${fmt("%.2f", shuffleTotalMb)},""" +
        s""""spill_total_mb":${fmt("%.2f", spillTotalMb)},""" +
        s""""shuffle_mb":$shuffleMb,"spill_mb":$spillMb,""" +
        s""""load_q":$loadQ,"busy_q":$busyQ,"steal_q":$stealQ,""" +
        s""""queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}"""

    // Always land the artifact at a well-known repo path (the driver
    // doesn't reliably set BENCH_OUT, and sbt's [info] prefix can
    // survive on stdout — VERDICT r2 "What's wrong" #4).
    val fixed = Paths.get("tmp/bench_self.json")
    Files.createDirectories(fixed.getParent)
    Files.writeString(fixed, json + "\n")
    sys.env.get("BENCH_OUT").foreach { p =>
      Files.writeString(Paths.get(p), json + "\n")
    }
    println(s"GRAFT_BENCH_JSON $json")

    // The driver records only the tail (~2000 chars) of the run's
    // output; past ~85 queries the full JSON line no longer fits and
    // the driver saw parsed:null (BENCH_r04/r05). The LAST line is
    // therefore a compact digest guaranteed to fit the window: the
    // total, error count, and one representative query per operator
    // family at 2-decimal precision. The complete per-query map is in
    // tmp/bench_self.json, BENCH_OUT, and the marker line above.
    val headline = Seq(
      "q_agg_pricing", "q_rollup", "q_window_running", "q_sessionize",
      "q_join_star", "q_join_salted", "q_join_bucketed", "q_join_asof",
      "q_date_slice", "q_upsert_lww", "q_tx_lww", "q_json_extract",
      "q_dedup_exact", "q_dedup_minhash_pairs", "q_dedup_ngram",
      "q_dedup_apply", "q_sim_topk", "q_sim_lsh", "q_sim_ivf",
      "q_sim_cosine_dedup", "q_text_tfidf", "q_lang_id",
      "q_sketch_distinct", "q_sample_stratified", "q_pack_sequences",
      "q_multimodal_decode", "q_stream_join", "q_stream_windows",
      "q_stream_neardedup", "q_stream_drift",
      "q_token_budget", "q_zorder",
      // round-7 families
      "q_graph_pagerank", "q_mixture_divergence", "q_sample_temperature",
      "q_cdc_apply", "q_join_scd2", "q_shard_order", "q_agg_incremental")
    val byName =
      results.map { case (k, v, _, _, _, _, _) => k -> v }.toMap
    def compactLine(nHead: Int): String = {
      val hq = headline.take(nHead)
        .flatMap(k => byName.get(k).map(v => s"${jstr(k)}:${fmt("%.2f", v)}"))
        .mkString("{", ",", "}")
      val cerrs = results.collect { case (k, _, Some(e), _, _, _, _) =>
        s"${jstr(k)}:${jstr(e.take(80))}"
      }.take(3).mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt("%.2f", total)},"unit":"sec",""" +
        s""""repeat":$repeat,"pass_totals":$passes,""" +
        s""""loadavg_per_pass":$loads,""" +
        s""""loadavg_max":${fmt("%.2f", loadMax)},""" +
        s""""cpu_busy_per_pass":$busies,""" +
        s""""cpu_steal_per_pass":$steals,""" +
        s""""n_retried":${retried.size},""" +
        s""""shuffle_total_mb":${fmt("%.2f", shuffleTotalMb)},""" +
        s""""spill_total_mb":${fmt("%.2f", spillTotalMb)},""" +
        s""""n":${results.size},"nerr":${results.count(_._3.isDefined)},""" +
        s""""errors":$cerrs,"queries":$hq,""" +
        s""""queries_all":"tmp/bench_self.json","sf":${jstr(sfDir)}}"""
    }
    val compact = (headline.size to 0 by -1).iterator
      .map(compactLine).find(_.length <= 1800)
      .getOrElse(compactLine(0))
    println(compact)
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
