package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** HyperLogLog distinct-count sketch on the PORTABLE hash family —
  * the register-based complement to [[KmvSketch]] (Flajolet, Fusy,
  * Gandouet & Meunier, AofA 2007).
  *
  * Why another distinct sketch next to KMV: the HLL state is m
  * fixed-position byte registers (here m = 256), so its size never
  * depends on k-th-minimum bookkeeping, merge is a plain per-register
  * MAX (associative, commutative, idempotent — the friendliest
  * possible combine at 100 TB: registers fold map-side, across
  * partitions, days, and tiers, and an idempotent merge even survives
  * replayed batches), and the accuracy/space trade-off is the
  * published 1.04/√m. Spark's own `approx_count_distinct` IS HLL++,
  * but its register state is opaque to any external engine; this one
  * is built on the portable polynomial hash, so every register — and
  * with it the estimate — replays arithmetically in DuckDB SQL,
  * giving the approximate operator a full value-level oracle.
  *
  * Arithmetic discipline (how a floating sketch becomes gateable):
  *  - the uniformized hash h is split INTEGER-pure: register index
  *    j = h mod 256, window w = h div 256 (< 2²² since the modulus is
  *    1e9+7), and the rank ρ = (leading zeros of the 22-bit window)+1
  *    computed as 23 − length(bin(w)) — `bin` renders the minimal
  *    binary string in BOTH engines, so ρ needs no log2 and no float;
  *  - the register sum Σ 2^(−M_j) is emitted as the EXACT integer
  *    Σ 2^(23−M_j) (every term a dyadic ≤ 2²³, so the BIGINT sum is
  *    order-free and bitwise-gateable);
  *  - only the final estimate touches doubles: one literal-identical
  *    division (α·m²·2²³ interpolated from the same Scala double into
  *    both engines) or the linear-counting branch m·ln(m/V), rounded
  *    once at 6 dp (the BM25/DSIR ln discipline).
  */
object HllSketch {

  /** m = 2⁸ registers: σ ≈ 1.04/√256 = 6.5% — the audit tier; raise
    * to 2¹²⁺ for production estimates (the arithmetic is unchanged). */
  val Registers = 256

  /** The hash window above the register index: (1e9+7) div 256 < 2²². */
  val WindowBits = 22

  /** α₂₅₆·m²·2²³ — the raw-estimate numerator over the scaled integer
    * register sum. Computed HERE once; `toString` interpolates the
    * shortest round-tripping form into both engines. */
  val AlphaNumerator: Double =
    0.7213 / (1.0 + 1.079 / Registers) * Registers * Registers *
      (1L << (WindowBits + 1)).toDouble

  /** Raw-estimate threshold under which linear counting takes over
    * (the published 2.5·m small-range correction). */
  val SmallRangeBound: Double = 2.5 * Registers

  /** Register index of a uniformized portable hash (∈ [0, 256)). */
  def bucket(h: Column): Column = pmod(h, lit(Registers.toLong))

  /** Register rank ρ ∈ [1, 23]: leading zeros of the 22-bit window
    * + 1, via the cross-engine minimal-binary-string identity
    * ρ = 23 − length(bin(w)) (bin(0) = "0" would give 22, but the
    * w = 0 case must saturate to 23, handled explicitly). */
  def rho(h: Column): Column = {
    val w = shiftright(h, 8)
    when(w === 0L, lit(WindowBits + 1))
      .otherwise(lit(WindowBits + 1) - length(bin(w)))
      .cast(LongType)
  }

  /** Per-group register frame: one row per (group, register) with the
    * register value M_j = max ρ. THE mergeable form — a coarser
    * grouping (or the global sketch) is a further groupBy(j).max(m)
    * over this frame alone, never re-touching the data. */
  def registers(
      df: DataFrame,
      groupCol: Column,
      hashCol: Column): DataFrame =
    df.select(groupCol.as("g"), bucket(hashCol).as("j"),
        rho(hashCol).as("r"))
      .groupBy(col("g"), col("j"))
      .agg(max(col("r")).as("m"))

  /** Estimate tail over a register frame (`g`, `j`, `m`): emits per
    * group the occupied-register count, the EXACT scaled register sum
    * Σ 2^(23−M_j) (absent registers contribute 2²³ each — integer,
    * bitwise-gateable), and the 6-dp estimate with the published
    * small-range linear-counting branch. */
  def estimate(regs: DataFrame): DataFrame = {
    val full = lit(1L << (WindowBits + 1))
    val agg = regs.groupBy(col("g"))
      .agg(count(lit(1)).as("n_occupied"),
        sum(pow(lit(2.0), lit((WindowBits + 1).toLong) - col("m"))
          .cast(LongType)).as("__z_occ"))
      .withColumn("zsum_scaled",
        col("__z_occ") + (lit(Registers.toLong) - col("n_occupied")) * full)
    val vZero = lit(Registers.toLong) - col("n_occupied")
    val raw = lit(AlphaNumerator) / col("zsum_scaled").cast(DoubleType)
    val linear = lit(Registers.toDouble) *
      log(lit(Registers.toDouble) / vZero.cast(DoubleType))
    agg.select(col("g"), col("n_occupied"), col("zsum_scaled"),
      round(when(raw <= SmallRangeBound && vZero > 0L, linear)
        .otherwise(raw), 6).as("hll_estimate"))
  }
}
