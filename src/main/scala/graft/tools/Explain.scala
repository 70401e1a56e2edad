package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Physical-plan audit: dump `explain("formatted")` for selected (or
  * all) catalog queries and flag plan smells — scans without column
  * pruning, missing pushed filters, non-codegen stages.
  *
  * Usage: sbt "runMain graft.tools.Explain [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local("graft-explain")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $name =====")
      println(plan)
      // cheap smells summary
      val readSchemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      val wideScan = readSchemas.exists(_.split(",").length > 8)
      val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      println(s"--- scans: ${readSchemas.size}, " +
        s"pushedFilterSets: ${pushed.count(_.nonEmpty)}, " +
        s"wideScan(>8 cols): $wideScan")
    }
    spark.stop()
  }
}
