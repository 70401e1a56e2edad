package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** One-shot measurement for the q_graph_ppr early-exit decision
  * (VERDICT r14 item 4): does the gated 5-round personalized-PageRank
  * reach an exact decimal fixpoint before round 5 (in which case a
  * tolerance-0 early exit would be hash-preserving AND save rounds),
  * and what does each convergence check cost? Prints the per-round
  * max |Δrank| at sf0.1. */
object PprConvergence {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-ppr-conv")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("supp"),
        (col("o_custkey") + lit(1000000L)).as("cust"))
    val edges = pairs.select(col("supp").as("src"), col("cust").as("dst"))
      .union(pairs.select(col("cust").as("src"), col("supp").as("dst")))
    val seeds = pairs.select(col("supp").as("node"))
      .filter(col("node") % 10 === 0).distinct()
    for (it <- 1 to 5) {
      val t0 = System.nanoTime()
      val (prev, _) = graft.operators.Graph
        .personalizedPageRankConverged(edges, seeds, iters = it)
      val (next, _) = graft.operators.Graph
        .personalizedPageRankConverged(edges, seeds, iters = it + 1)
      val d = next.withColumnRenamed("rank", "r2")
        .join(prev, Seq("node"))
        .agg(max(abs(col("r2").cast("double") -
          col("rank").cast("double")))).collect()(0).getDouble(0)
      println(f"PPRCONV round=$it maxDelta=$d%.6f " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
