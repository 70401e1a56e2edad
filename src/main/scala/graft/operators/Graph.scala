package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.storage.StorageLevel

/** Iterative graph propagation — the workload class the rest of the
  * catalog doesn't exercise (every other operator is a bounded DAG;
  * here the plan GROWS per iteration and must be actively managed).
  *
  * The Spark iterative idiom used by [[pageRank]]:
  *  - each iteration's ranks are persisted and MATERIALIZED before the
  *    previous iteration is unpersisted (otherwise the unpersist
  *    re-triggers the whole chain);
  *  - `localCheckpoint` cuts the logical lineage every iteration — by
  *    iteration ~10 an uncut plan tree is exponentially re-analyzed by
  *    Catalyst and task binaries bloat (the classic iterative-Spark
  *    failure mode);
  *  - the edge list and out-degrees persist once and are reused by
  *    every iteration (at 100 TB: hash-partitioned on src, so the
  *    per-iteration join co-locates without a re-shuffle of edges).
  *
  * Determinism discipline (the dsum rule, applied per iteration):
  * contributions are computed in DOUBLE (IEEE +,*,/ are correctly
  * rounded, hence engine-identical), ROUNDED to 6 dp, then summed as
  * DECIMAL(18,6) — exact, order-independent — and the damping teleport
  * added as an exact decimal. The DuckDB oracle replays the identical
  * arithmetic with unrolled iteration CTEs and hash-matches.
  */
object Graph {

  /** PageRank over an edge list (`src`, `dst` columns), `iters` full
    * power iterations, damping = 0.85, teleport = 0.15, initial rank
    * 1 for every node. Nodes = distinct endpoints; dangling nodes
    * (no out-edges) leak their rank mass — the simple formulation,
    * replicated exactly by the oracle. Returns (node, rank) with rank
    * DECIMAL(18,6). */
  def pageRank(
      edges: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    // e is persisted HASH-PARTITIONED ON src: the per-iteration join
    // requires clustering on src, so a pre-partitioned cache satisfies
    // it from the block manager every round — without the repartition
    // the cached edges re-shuffle once per iteration (persist stores
    // whatever partitioning the distinct left, which is on (src, dst),
    // not src). outdeg inherits the same partitioning for free.
    val e = edges.select(col("src"), col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count(); outdeg.count() // materialize the loop invariants

    var ranks = nodes
      .withColumn("rank", lit("1.000000").cast(DecimalType(18, 6)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()

    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          round(col("rank").cast(DoubleType) * lit(0.85) /
            col("__d").cast(DoubleType), 6)
            .cast(DecimalType(18, 6)).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__in"))
      // eager localCheckpoint: cuts the lineage AND materializes (the
      // result is held by the block manager), so the old generation
      // can be released immediately without re-triggering its chain
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit("0.150000").cast(DecimalType(18, 6)) +
            coalesce(col("__in"), lit(0).cast(DecimalType(18, 6))))
            .cast(DecimalType(18, 6)).as("rank"))
        .localCheckpoint()
      ranks.unpersist(false)
      ranks = next
    }
    e.unpersist(false); outdeg.unpersist(false); nodes.unpersist(false)
    ranks
  }

  /** Degree statistics of an edge list: per-node out/in degree — the
    * control-plane profile every graph job starts with (skew here
    * decides salting/partitioning downstream). One shuffle per
    * direction on the node key. */
  def degreeStats(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
