package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The standard curation flow as ONE named operator — what a user of
  * the engine actually calls for the common case, instead of wiring
  * the stages by hand: per-stratum quality gate → exact dedup on the
  * normalized-text fingerprint → temperature (α = 1/2) rebalance to a
  * row budget → deterministic shard layout. Every stage is the
  * individually-gated operator (quantileFilter, Dedup.exact,
  * temperatureSample, shardOrder), so this is pure composition — same
  * semantics, one plan.
  *
  * Scale shape: the temperature stage consumes its input twice
  * (survivor counts + filter join), so the dedup-survivor frame is
  * persisted here and the two consumers share ONE corpus pass; the
  * cache is released as soon as the composed result (≤ `totalTarget`
  * thin rows) is forced. The caller owns only the returned persisted
  * frame and should `unpersist()` it when done. 100 TB runs that need
  * restartability still materialize each stage to parquet between
  * stages — that swaps the persist for a write, same single-pass
  * shape.
  */
object Curation {

  /** @param strataCols   quality/mix strata (e.g. language)
    * @param idCol        unique row id (drives every deterministic
    *                     decision — gate ties, sample membership,
    *                     shard order)
    * @param text         document text (dedup fingerprint source)
    * @param qualityCol   ordering metric for the gate (higher = better)
    * @param dropPermille bottom fraction dropped per stratum
    * @param totalTarget  post-rebalance row budget
    * @param nShards      output shard count
    * @param dsirTarget   optional DSIR stage (between dedup and the
    *                     rebalance — the canonical slot for
    *                     distribution-matching selection): rows where
    *                     this predicate holds define the target
    *                     distribution, and only documents whose
    *                     [[TextAnalysis.dsirLogWeights]] score reaches
    *                     the corpus (1000 − dsirKeepPermille)‰ order
    *                     statistic survive (ties at the threshold are
    *                     kept — deterministic and replicable)
    * @param dsirKeepPermille head share kept by the DSIR stage
    * @return input columns + (shard, seq) */
  def standardPipeline(
      docs: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      text: Column,
      qualityCol: Column,
      dropPermille: Int,
      totalTarget: Long,
      nShards: Int,
      sampleSeed: Int = 19,
      shardSeed: Int = 23,
      dsirTarget: Option[Column] = None,
      dsirKeepPermille: Int = 1000): DataFrame = {
    val gated = Sampling.quantileFilter(
      docs, strataCols, qualityCol, col(idCol), dropPermille)
    val deduped = Dedup.exact(
        gated, TextAnalysis.fingerprintMd5(text), idCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val selected = dsirSelect(deduped, idCol, text, dsirTarget,
      dsirKeepPermille)
    val sampled = Sampling.temperatureSample(
      selected, strataCols, col(idCol), totalTarget, sampleSeed)
    // Force the small composed result so the dedup-survivor cache
    // (corpus-sized) can be dropped before returning — the
    // Dedup.ownResult idiom: the caller owns only `out`.
    val out = Sampling.shardOrder(sampled, col(idCol), nShards, shardSeed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    // release BOTH corpus-scale stage caches (selected is its own
    // persisted frame only when the DSIR stage was armed)
    if (!(selected eq deduped)) selected.unpersist(false)
    deduped.unpersist(false)
    out
  }

  /** The optional DSIR selection stage of [[standardPipeline]]: score
    * every surviving document against the `target` slice
    * ([[TextAnalysis.dsirLogWeights]]), find the keep threshold as ONE
    * order statistic ([[Stats.kthValue]] — no full rank), and keep
    * rows at or above it. `target = None` or `keepPermille = 1000` is
    * the identity (the pre-DSIR pipelines replay unchanged). A
    * document without a single bigram (< 2 tokens) has no score under
    * the bag model and is DROPPED when the stage is armed — at
    * training-data granularity such documents are noise, but set
    * `keepPermille = 1000` if they must survive. */
  private[operators] def dsirSelect(
      docs: DataFrame,
      idCol: String,
      text: Column,
      target: Option[Column],
      keepPermille: Int): DataFrame = {
    require(keepPermille >= 1 && keepPermille <= 1000,
      s"dsirKeepPermille out of range: $keepPermille")
    if (target.isEmpty || keepPermille == 1000) docs
    else {
      val w = TextAnalysis.dsirLogWeights(docs, idCol, text, target.get)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = w.count()
      require(n >= 1, "dsirSelect: no scored documents")
      // threshold = the ((1000 − keep)‰ · n, ceil)-th smallest score;
      // rows BELOW it drop, ties at it are kept
      val k = math.max(1L,
        ((1000L - keepPermille) * n + 999L) / 1000L)
      val thr = Stats.kthValue(w, "score", k)
      val kept = docs.join(
        w.filter(col("score") >= thr).select(col(idCol)), Seq(idCol))
      val out = kept.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      w.unpersist(false)
      out
    }
  }

  /** The staged, RESTARTABLE form of [[standardPipeline]]: each stage
    * materializes to `stageDir/<stage>` parquet and a re-run resumes
    * from the last completed stage (presence of the `_SUCCESS` marker
    * — a crash mid-write leaves none, so the interrupted stage
    * rebuilds with mode=overwrite while every finished stage is read
    * back untouched). This is the 100 TB operational shape: a
    * multi-hour curation run survives preemption at the cost of one
    * parquet round-trip per stage, and the double consumption in the
    * temperature stage becomes two cheap scans of the deduped parquet
    * instead of a cache.
    *
    * Same stages, same parameters, same result as
    * [[standardPipeline]] (CurationSpec diffs them); the `text` /
    * `qualityCol` expressions are resolved against the read-back
    * frames, which carry the input's columns unchanged. */
  def standardPipelineStaged(
      docs: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      text: Column,
      qualityCol: Column,
      dropPermille: Int,
      totalTarget: Long,
      nShards: Int,
      stageDir: String,
      sampleSeed: Int = 19,
      shardSeed: Int = 23,
      dsirTarget: Option[Column] = None,
      dsirKeepPermille: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    def stage(name: String)(build: => DataFrame): DataFrame = {
      val path = s"$stageDir/$name"
      val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = done.getFileSystem(conf)
      if (!fs.exists(done))
        build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val gated = stage("gated")(Sampling.quantileFilter(
      docs, strataCols, qualityCol, col(idCol), dropPermille))
    val deduped = stage("deduped")(Dedup.exact(
      gated, TextAnalysis.fingerprintMd5(text), idCol))
    val selected =
      if (dsirTarget.isEmpty || dsirKeepPermille == 1000) deduped
      else {
        // dsirSelect persists its result for multi-consumer reads;
        // here the parquet stage IS the durable copy, so the
        // operator-internal cache is released right after the write
        // (None when the stage was already complete and not rebuilt)
        var built: Option[DataFrame] = None
        val st = stage("dsir") {
          val s0 = dsirSelect(deduped, idCol, text, dsirTarget,
            dsirKeepPermille)
          built = Some(s0)
          s0
        }
        built.foreach(_.unpersist(false))
        st
      }
    val sampled = stage("sampled")(Sampling.temperatureSample(
      selected, strataCols, col(idCol), totalTarget, sampleSeed))
    stage("sharded")(Sampling.shardOrder(
      sampled, col(idCol), nShards, shardSeed))
  }

  /** Dataset-versioning diff between two corpus snapshots: each id is
    * classified `added` (new only), `removed` (old only), `changed`
    * (both, content fingerprints differ), or `unchanged`. The audit
    * every incremental pipeline needs before shipping snapshot N+1 —
    * "what did this refresh actually touch" — and the precise input
    * for incremental recomputation (re-embed/re-score only
    * added+changed).
    *
    * Scale shape: fingerprints are computed per row inside the scans
    * (text never shuffles — only (id, 32-byte digest) pairs), then ONE
    * co-partitioned full-outer shuffle join on the id. No driver
    * state, no collect; both snapshots stream.
    *
    * Returns (idCol, old_fp, new_fp, status) — row-level, so callers
    * can join the added+changed set straight back into recompute.
    * Each snapshot must be UNIQUE on `idCol` (snapshots are keyed
    * corpora by definition; duplicate ids would fan out the
    * full-outer join) — dedup with [[Dedup.exact]] first if not. */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      fingerprint: Column): DataFrame = {
    val o = oldSnap.select(col(idCol), fingerprint.as("old_fp"))
    val n = newSnap.select(col(idCol), fingerprint.as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")))
  }
}
