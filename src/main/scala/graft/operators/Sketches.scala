package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Mergeable frequency sketches (Cormode & Muthukrishnan's count-min,
  * SIAM J. Algorithms 2005) over the engine's portable hash family —
  * the heavy-hitter counterpart of the KMV distinct sketch
  * (`functions/KmvSketch.scala`) and the histogram quantile sketch
  * (`Stats.quantileSketchState`): O(depth · width) integer state
  * regardless of corpus size, shards merge by summing cells, and
  * every arithmetic step is 64-bit integer so a DuckDB oracle replays
  * estimates bit for bit.
  *
  * Hashing: row j maps a pre-hashed key h (the [[Dedup.polyHash]]
  * polynomial, proven engine-identical by the q_fingerprint gate) to
  * bucket ((h · A(seed+j) + B(seed+j)) mod P) mod width — the same
  * affine family MinHash uses, constants derived arithmetically so
  * the oracle generator reproduces them.
  */
object Sketches {

  /** Sketch depth: 4 independent rows — overestimate probability
    * decays as (e/width)^depth per query; 4 is the classical
    * space/confidence sweet spot. */
  val Depth = 4

  /** Default affine-seed base; distinct from every MinHash/sampling
    * seed in use so CMS buckets are independent of them. */
  val SeedBase = 101

  private def bucket(j: Int, h: Column, width: Int, seedBase: Int): Column =
    pmod(pmod(h * Dedup.affineA(seedBase + j) +
      Dedup.affineB(seedBase + j), lit(Dedup.PortableMod)), lit(width.toLong))

  /** Count-min state from a (key, weight) frame: one (row, bucket)
    * cell per depth row, counts summed — ≤ Depth · width rows TOTAL.
    * Building from pre-aggregated per-key counts is count-distributive
    * (cell = Σ weights of keys hashing there), so the state equals the
    * one a per-occurrence stream build produces, with |keys| · Depth
    * shuffle rows instead of N · Depth. Mergeable: two shards' states
    * sum cell-wise ([[cmsMerge]]). */
  def cmsState(
      keyed: DataFrame,
      keyHash: Column,
      weight: Column,
      width: Int = 1024,
      seedBase: Int = SeedBase): DataFrame = {
    require(width >= 16 && width <= (1 << 20),
      s"width out of range: $width")
    keyed
      .select(weight.cast(LongType).as("__w"),
        explode(array((0 until Depth).map(j =>
          struct(lit(j).as("r"),
            bucket(j, keyHash, width, seedBase).as("b"))): _*)).as("__c"))
      .groupBy(col("__c.r").as("__row"), col("__c.b").as("__bucket"))
      .agg(sum(col("__w")).as("__cnt"))
  }

  /** Merge two CMS states built with the same (width, seedBase):
    * cell-wise count sum — associative and commutative, the
    * tree-reduce shard contract. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("__row"), col("__bucket"))
      .agg(sum(col("__cnt")).as("__cnt"))

  /** Point estimates from a CMS state for a SMALL candidate frame:
    * each candidate probes its Depth cells and takes the minimum —
    * the classical one-sided estimate (never below the true count;
    * above it only when every row collides). `candidates` must carry
    * `groupCols` and a `keyHash`-compatible hash column; returns the
    * candidate columns plus `c_est`. */
  def cmsEstimate(
      state: DataFrame,
      candidates: DataFrame,
      keyHash: Column,
      groupCols: Seq[String],
      width: Int = 1024,
      seedBase: Int = SeedBase): DataFrame = {
    val grp = groupCols.map(col)
    val probes = candidates
      .select(grp :+ explode(array((0 until Depth).map(j =>
        struct(lit(j).as("r"),
          bucket(j, keyHash, width, seedBase).as("b"))): _*)).as("__c"): _*)
      .select(grp ++ Seq(col("__c.r").as("__row"),
        col("__c.b").as("__bucket")): _*)
    probes.join(state, Seq("__row", "__bucket"))
      .groupBy(grp: _*)
      .agg(min(col("__cnt")).as("c_est"))
  }

  /** End-to-end heavy-hitter AUDIT over a key column (the q_sim_recall
    * pattern — the sketch is only trustworthy if its error is
    * measured): exact per-key counts (one map-side-combined pass),
    * the CMS built from them, and for the exact top-k keys the sketch
    * estimate next to the truth. `c_est ≥ c_true` is a hard invariant
    * (min of upper bounds); `overcount = c_est − c_true` is the
    * collision damage the width bound ε = e/width controls.
    *
    * Returns k rows: (token, c_true, c_est, overcount). */
  def cmsHeavyHitterAudit(
      items: DataFrame,
      key: Column,
      k: Int = 20,
      width: Int = 1024,
      seedBase: Int = SeedBase): DataFrame = {
    require(k >= 1 && k <= 1000, s"k out of range: $k")
    val exact = items.select(key.cast(StringType).as("__key"))
      .groupBy(col("__key"))
      .agg(count(lit(1)).as("c_true"))
      .select(col("__key"), col("c_true"),
        Dedup.polyHash(col("__key")).as("__h"))
      .localCheckpoint(true) // vocab-sized; two consumers below
    val state = cmsState(exact, col("__h"), col("c_true"),
      width, seedBase)
    val top = exact
      .orderBy(col("c_true").desc, col("__key").asc)
      .limit(k)
    cmsEstimate(state, top, col("__h"),
        Seq("__key", "c_true"), width, seedBase)
      .select(col("__key").as("token"), col("c_true"), col("c_est"),
        (col("c_est") - col("c_true")).as("overcount"))
  }
}
