package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Physical-plan audit: dump `explain("formatted")` for selected (or
  * all) catalog queries and flag plan smells — scans without column
  * pruning, missing pushed filters, non-codegen stages.
  *
  * Usage: sbt "runMain graft.tools.Explain [queryName ...]"
  *        sbt "runMain graft.tools.Explain --table"   # PLANS.md rows
  *
  * `--table` prints ONE markdown row per catalog query
  * (| query | scans | pushed-filter sets | wide scan | exchanges |
  * nested-loop |) plus a trailing GRAFT_PLAN_FLAGS line listing any
  * query with a nested-loop join or unpruned wide scan — the
  * machine-checkable form of the "no scale-killer" audit.
  */
object Explain {

  final case class Smells(
      scans: Int, pushed: Int, wide: Boolean,
      exchanges: Int, nestedLoop: Boolean)

  def smells(plan: String): Smells = {
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    Smells(
      scans = readSchemas.size,
      pushed = pushed.count(_.nonEmpty),
      wide = readSchemas.exists(_.split(",").length > 8),
      exchanges = "(?m)^\\s*[^\\n]*\\bExchange\\b".r
        .findAllMatchIn(plan).size,
      nestedLoop = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local("graft-explain")
    val tableMode = args.headOption.contains("--table")
    val filtered = if (tableMode) args.drop(1).toSeq else args.toSeq
    val names = if (filtered.nonEmpty) filtered
      else SparkEntry.queries.keys.toSeq.sorted
    val flagged = scala.collection.mutable.ListBuffer[String]()
    for (name <- names) {
      val plan =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable =>
          s"PLAN FAILED: ${e.getMessage}"
        }
      val sm = smells(plan)
      if (tableMode) {
        println(s"GRAFT_PLAN_ROW | $name | ${sm.scans} | ${sm.pushed} " +
          s"| ${sm.wide} | ${sm.exchanges} " +
          s"| ${if (sm.nestedLoop) "yes" else "no"} |")
        if (sm.nestedLoop || sm.wide) flagged += name
      } else {
        println(s"===== $name =====")
        println(plan)
        println(s"--- scans: ${sm.scans}, " +
          s"pushedFilterSets: ${sm.pushed}, " +
          s"wideScan(>8 cols): ${sm.wide}, " +
          s"exchanges: ${sm.exchanges}, nestedLoop: ${sm.nestedLoop}")
      }
    }
    if (tableMode)
      println("GRAFT_PLAN_FLAGS " +
        (if (flagged.isEmpty) "none" else flagged.mkString(",")))
    spark.stop()
  }
}
