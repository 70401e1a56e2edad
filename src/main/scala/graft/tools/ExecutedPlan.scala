package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Runtime-plan audit: execute selected catalog queries and dump the
  * FINAL adaptive plan — the only place AQE's exchange/stage reuse is
  * visible (the static explain shows the pre-execution plan, where
  * identical shuffle subtrees still appear duplicated).
  *
  * Usage: sbt "runMain graft.tools.ExecutedPlan <queryName ...>"
  */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local("graft-executed-plan")
    for (name <- args.toSeq) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString
      println(s"===== $name =====")
      println(plan)
      val scans = "Scan parquet".r.findAllIn(plan).size
      val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(plan).size
      println(s"--- executed scans: $scans, reused stages: $reused")
    }
    spark.stop()
  }
}
