package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Sequence packing: assemble documents into fixed-token-capacity bins
  * (the "pack examples into 4k/8k context windows" step of a
  * pretraining pipeline).
  *
  * Packing is inherently sequential — each bin decision depends on the
  * running fill — so the scale design shards first: documents spread
  * over `nShards` deterministic id-hash shards, each shard packed
  * independently in ascending id order with greedy next-fit (a doc
  * opens a new bin when it would overflow the current one; a doc
  * longer than the capacity gets a bin of its own). Shards are
  * embarrassingly parallel and the per-shard walk is a streaming
  * mapPartitions with O(1) state — the one genuinely imperative
  * per-partition loop this operator family needs (the preceding
  * repartition+sort is the only shuffle).
  *
  * Determinism: shard assignment is the portable affine hash of the
  * id (reproducible across runs/engines — the DuckDB oracle replays
  * the same walk as a recursive CTE), and next-fit order is the id
  * order, never partition arrival order.
  *
  * New-capability work beyond the reference surface (SURVEY.md §7.2
  * step 7).
  */
object Packing {

  /** Pack docs into (shard, bin) with greedy next-fit at `capacity`
    * tokens. Returns one row per doc: (id, n_tok, shard, bin). */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      nTokCol: String,
      capacity: Long,
      nShards: Int,
      seed: Int = 0): DataFrame = {
    require(capacity > 0 && nShards > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        (Sampling.idBucket(col(idCol), seed) % nShards).as("shard"),
        col(idCol).cast(LongType).as("id"),
        col(nTokCol).cast(LongType).as("n_tok"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L; var bin = 0L; var fill = 0L
        it.map { case (shard, id, n) =>
          if (shard != curShard || (fill > 0 && fill + n > capacity)) {
            bin = if (shard != curShard) 0L else bin + 1L
            curShard = shard
            fill = 0L
          }
          fill += n
          (id, n, shard, bin)
        }
      }
      .toDF("id", "n_tok", "shard", "bin")
  }
}
