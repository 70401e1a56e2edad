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
    // Partition probe WITHOUT `toRdd` (VERDICT r16 item 7 / ADVICE):
    // toRdd builds the ADAPTIVE executed plan, and under AQE a plan
    // containing exchanges would execute its upstream query stages at
    // probe time and discard them (and a streaming frame would
    // throw). Probe the non-adaptive sparkPlan instead: a plan that
    // already carries an Exchange has its partitioning decided by
    // that shuffle (sized to the cluster) — adding a second exchange
    // could only re-shuffle, so return the frame unchanged without
    // ever building an executed plan. Exchange-free plans (every
    // current call site: scan+project or a cached base) preserve
    // their leaves' partitioning through narrow operators, so the
    // count is the sum over leaves — file-scan splits come from the
    // lazily-built scan RDD (no job, listing memoized in the
    // relation), other leaves (cache scans) from their own RDD.
    require(!df.isStreaming,
      "Guards.parallelized: batch frames only (streaming plans have " +
        "no partition count to probe)")
    // sparkPlan predates EnsureRequirements, so distribution-required
    // exchanges (joins/aggregates/windows) are NOT visible in it yet.
    // The probe therefore only recognizes NARROW plan shapes — the
    // scan+project(+filter/coalesce/union) frames every current call
    // site passes — where the partition count is fully determined by
    // the leaves; anything else returns None and the frame is left
    // unchanged (its partitioning will be decided by the exchanges
    // EnsureRequirements inserts, themselves sized to the cluster).
    import org.apache.spark.sql.execution._
    def partsOf(p: SparkPlan): Option[Int] = p match {
      case _: exchange.Exchange => None // partitioning already decided
      case c: CoalesceExec =>
        partsOf(c.child)
          .map(n => math.min(math.max(1, c.numPartitions), n))
      case f: FileSourceScanExec =>
        Some(f.inputRDDs().map(_.getNumPartitions).sum)
      case u: UnionExec =>
        val cs = u.children.map(partsOf)
        if (cs.forall(_.isDefined)) Some(cs.flatten.sum) else None
      case pr: ProjectExec => partsOf(pr.child)
      case fl: FilterExec => partsOf(fl.child)
      case leaf: LeafExecNode => Some(leaf.execute().getNumPartitions)
      case _ => None
    }
    partsOf(df.queryExecution.sparkPlan) match {
      case Some(parts) if parts.max(1) < par =>
        // deterministic content-hash distribution, NOT round-robin:
        // keyless repartition pays a full local sort of its input
        // (spark.sql.execution.sortBeforeRepartition, for retry
        // determinism) which measurably ate the parallelism win; a
        // hash of the whole row is retry-deterministic by construction
        // (guide §2.5: derive synthetic keys deterministically)
        df.repartition(par, xxhash64(struct(df.columns.map(col): _*)))
      case _ => df
    }
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

  /** Exact drop-in replacement for `round(x, scale)` on a DOUBLE
    * column that avoids Catalyst's per-row `BigDecimal.valueOf`
    * (= one `Double.toString` shortest-decimal rendering per row —
    * the dominant per-task cost of the dsum discipline's
    * "double → 6-dp round → decimal fold" hot paths; the MmdFold
    * precedent, round-16 item 7).
    *
    * Strategy: scaled-integer HALF_UP in pure codegen arithmetic,
    * with a fallback to the real `round(x, scale)` whenever the
    * scaled value sits inside the TIE NEIGHBORHOOD where the two
    * decimal readings of a double (shortest-decimal rendering vs
    * exact binary expansion) could disagree about the half-up
    * decision. Outside that neighborhood the two readings round
    * identically, so the fast path is exact REGARDLESS of which
    * reading Catalyst's round uses.
    *
    * Proof sketch (pinned bit-for-bit by `FastRoundSpec`):
    * let p = 10^scale (exactly representable), y = x·p computed in
    * double (one correctly-rounded multiply, |y − x·p| ≤ ulp(y)/2),
    * and D(x) the shortest-decimal reading of x
    * (|D(x) − x| ≤ ulp(x)/2, so |D(x)·p − y| ≤ 1.5·ulp(y) <
    * |y|·3.4e-16). Catalyst's result is n/p as a double where
    * n = half-up(D(x)·p).
    *  - f = floor(y) is exact; frac = y − f is exact (a multiple of
    *    ulp(y) with magnitude < 1 is representable, IEEE subtraction
    *    of representable results is exact).
    *  - half-up(v) jumps only at half-integers, NOT at integers
    *    (m − ε and m + ε both round to m), so when
    *    |frac − 0.5| > eps ≥ |D(x)·p − y| the decision
    *    n = (frac > 0.5 ? f+1 : f) is the same for y and D(x)·p
    *    even when their floors differ. This also covers negatives:
    *    ties-away-from-zero only differs from ties-up AT ties, which
    *    fall back.
    *  - |frac − 0.5| is exact for frac ∈ [0.25, 1] (Sterbenz) and has
    *    ≤ 2.8e-17 absolute error below, where its magnitude is
    *    ≥ 0.25 − far above eps either way.
    *  - eps = |y|·1e-15 + 1e-18 covers the 3.4e-16·|y| error window
    *    with ~3× margin; n/p is one correctly-rounded IEEE division
    *    of exact operands = nearest double to n·10^−scale, exactly
    *    what `BigDecimal.setScale(scale, HALF_UP).doubleValue()`
    *    returns.
    *  - |y| ≥ 2^51, NaN, ±Inf and NULL all fail the magnitude guard
    *    (Spark orders NaN above every double, so `abs(y) < 2^51` is
    *    false) and take the fallback — identical by definition.
    * All branches are codegen-capable built-ins; the fallback `If`
    * arm is evaluated lazily, so the BigDecimal path runs only for
    * the ~eps fraction of rows near a tie. */
  def fastRound(x: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 15,
      s"fastRound scale out of range: $scale")
    val p = math.pow(10, scale) // exact double for scale <= 15
    val y = x * lit(p)
    val f = floor(y) // LongType; saturates (never throws) past 2^63
    val frac = y - f.cast(DoubleType)
    val eps = abs(y) * lit(1e-15) + lit(1e-18)
    val n = when(frac > lit(0.5), f + lit(1L)).otherwise(f)
    when(abs(y) < lit(2.251799813685248e15) && // 2^51
      abs(frac - lit(0.5)) > eps,
      n.cast(DoubleType) / lit(p))
      .otherwise(round(x, scale))
  }

  /** Exact drop-in replacement for the dsum idiom
    * `round(x, scale).cast(dt)` (DOUBLE x, DecimalType dt with
    * dt.scale == scale) — the catalog's per-row "double → s-dp round
    * → decimal fold" discipline. [[fastRound]] removes the
    * `Double.toString` inside `round`, but the decimal CAST pays a
    * second one (`Decimal.fromDouble` renders shortest-decimal too);
    * this helper builds the decimal directly from the scaled long n,
    * eliminating both.
    *
    * Exactness, on top of the [[fastRound]] proof: the reference
    * computes r = nearest_double(n·10^−scale) and then reads r back
    * as HALF_UP(D(r), scale). With the tightened |y| < 2^50 guard,
    * |n| ≤ 2^50 so |r| ≤ 2^50·10^−scale and
    * ulp(r) ≤ r·2^−52 ≤ 0.25·10^−scale; the reading error
    * |D(r) − n·10^−scale| ≤ ulp(r) stays strictly inside the
    * half-tie radius 0.5·10^−scale, so the cast recovers EXACTLY
    * n·10^−scale — the value this helper emits as
    * unscaled-n × 10^−scale (one exact compact-decimal multiply by
    * the (1, scale) literal; no rendering). The fast branch can
    * never hit the cast's overflow-to-NULL (|r| < 10^12 needs
    * precision 18 − 6; generally |n| ≤ 2^50 < 10^16 fits every
    * catalog dt), and ties/huge/NaN/±Inf/NULL take the fallback,
    * which IS the reference expression. Pinned bit-for-bit by
    * `FastRoundSpec` including decimal-unscaled comparison. */
  def fastRoundDec(x: Column, scale: Int, dt: DecimalType): Column = {
    require(dt.scale == scale,
      s"fastRoundDec target scale ${dt.scale} != round scale $scale")
    fastToDec(x, dt, round(x, scale).cast(dt))
  }

  /** Exact drop-in replacement for a DIRECT `x.cast(dt)` of a DOUBLE
    * column (no explicit round) — the same shortest-decimal HALF_UP
    * reading as [[fastRoundDec]]'s reference (Spark's double→decimal
    * cast IS `BigDecimal.valueOf(x).setScale(dt.scale, HALF_UP)`), so
    * the identical fast path applies; only the fallback differs (the
    * raw cast, which at huge magnitudes keeps more integral digits
    * than round-then-cast would). Pinned by `FastRoundSpec`. */
  def fastCastDec(x: Column, dt: DecimalType): Column =
    fastToDec(x, dt, x.cast(dt))

  private def fastToDec(
      x: Column, dt: DecimalType, fallback: Column): Column = {
    val scale = dt.scale
    require(scale >= 0 && scale <= 15,
      s"fastToDec scale out of range: $scale")
    require(dt.precision - dt.scale >= 16 - scale,
      s"fastToDec target $dt cannot hold every |n| <= 2^50")
    val p = math.pow(10, scale)
    val y = x * lit(p)
    val f = floor(y)
    val frac = y - f.cast(DoubleType)
    val eps = abs(y) * lit(1e-15) + lit(1e-18)
    val n = when(frac > lit(0.5), f + lit(1L)).otherwise(f)
    val unit = lit(new java.math.BigDecimal(
      java.math.BigInteger.ONE, scale)) // 10^-scale as (scale, scale)
    when(abs(y) < lit(1.125899906842624e15) && // 2^50
      abs(frac - lit(0.5)) > eps,
      (n.cast(DecimalType(18, 0)) * unit).cast(dt))
      .otherwise(fallback)
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
