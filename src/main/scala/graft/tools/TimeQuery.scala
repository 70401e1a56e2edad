package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Repeat-timing aid: run a catalog query N times in one session and
  * print per-iteration seconds — separates one-time costs (scan
  * warm-up, codegen, shared-cache fill) from steady-state execution.
  *
  * Usage: sbt "runMain graft.tools.TimeQuery <name> [reps]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_agg_pricing")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-time")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      println(f"TIMEQ $name rep=$i build=${(t1 - t0) / 1e9}%.3f " +
        f"exec=${(t2 - t1) / 1e9}%.3f total=${(t2 - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
