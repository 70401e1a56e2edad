package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for training-data curation.
  *
  * A 100 TB corpus is never trained on wholesale: domains/languages are
  * re-weighted ("data mixing") by DOWNSAMPLING over-represented strata
  * to a target size. Two properties matter at scale:
  *
  *  - **Determinism**: membership is a pure function of the row id
  *    (portable affine hash → bucket), never of `rand()` — the sample
  *    is reproducible across runs, task retries, and engines, and the
  *    DuckDB oracle replicates it bit-for-bit.
  *  - **Narrow plan**: the only shuffle is the tiny per-stratum count
  *    aggregate (|strata| rows, broadcast back); the data itself is
  *    filtered by a codegen'd integer predicate in place — no
  *    repartition, no sort, no sampling pass.
  *
  * Rate quantization: a stratum of size n_s keeps bucket <
  * `(target·B) div n_s` of B buckets, i.e. a rate within 1/B of
  * target/n_s — exact integer arithmetic end-to-end (no float
  * thresholds, which engines round differently). Strata at or under
  * target are kept whole.
  *
  * New-capability work beyond the reference surface (SURVEY.md §7.2
  * step 7).
  */
object Sampling {

  /** Buckets for rate quantization: rates resolve to 1e-6. */
  val Buckets = 1000000L

  /** Deterministic bucket in [0, Buckets) from a non-negative integral
    * id: affine transform of the portable hash family, seed selects
    * the family member. */
  def idBucket(id: Column, seed: Int = 0): Column =
    pmod(pmod(id, lit(Dedup.PortableMod)) * Dedup.affineA(seed)
      + Dedup.affineB(seed), lit(Dedup.PortableMod)) % Buckets

  /** Downsample each stratum to ≈`target` rows (strata already at or
    * below `target` pass through whole). Membership is decided by
    * [[idBucket]] of `idCol` against the stratum's quantized keep
    * threshold — reproducible and engine-portable. */
  def stratifiedSample(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: Column,
      target: Long,
      seed: Int = 0): DataFrame = {
    require(target > 0 && target <= Long.MaxValue / Buckets,
      s"target out of range: $target")
    val counts = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__ns"))
    // integer floor-division on both engines (Spark `div`, DuckDB `//`)
    val thr = expr(s"${target * Buckets}L div __ns")
    df.join(broadcast(counts), strataCols)
      .filter(idBucket(idCol, seed) < thr)
      .drop("__ns")
  }

  /** Keep at most `cap` rows per stratum — EXACTLY `cap` for strata
    * over it (domain capping: no single domain/source may dominate the
    * training mix, the complement of [[stratifiedSample]]'s rate-based
    * thinning). Which rows survive is a pure function of the row id:
    * rows rank by ([[idBucket]], id) inside their stratum and the
    * first `cap` win — reproducible across runs, retries, and engines.
    *
    * Cost = one hash shuffle on the strata columns + a per-partition
    * sort (the `row_number` window); no second pass, no rate
    * estimation. A stratum's rows sort within one task — fine while
    * every stratum fits a task's spill budget (domains at 100 TB:
    * millions of rows, sorts fine); a pathological mega-stratum would
    * call for a two-level pre-cap (cap per (stratum, idBucket band))
    * before the exact rank. */
  def capPerStratum(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: Column,
      cap: Int,
      seed: Int = 0): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(idBucket(idCol, seed).asc, idCol.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }
}
