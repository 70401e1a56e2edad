package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.SparkEntry
import graft.core.Sessions

/** Runtime scan audit: execute selected catalog queries and report the
  * ACTUAL input volume (bytes/records read from files, summed over
  * tasks). Plan-text greps mislead twice over — the static explain
  * shows duplicated shuffle subtrees that may or may not collapse at
  * runtime, and persisted frames print their full child plan even
  * though execution reads the cache. Task input metrics count what was
  * genuinely read: a query whose bytesRead is ~N× its input table size
  * scans the corpus ~N times. Caveat: reads of PERSISTED blocks also
  * register as input metrics, so cache-heavy operators (the dedup
  * family's shared pair set) read high — compare against table size
  * only for persist-free queries.
  *
  * Usage: sbt "runMain graft.tools.ExecutedPlan [queryName ...]"
  * (no args = full catalog)
  */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local("graft-executed-plan")
    val bytes = new AtomicLong
    val records = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.inputMetrics.bytesRead)
          records.addAndGet(m.inputMetrics.recordsRead)
        }
      }
    })
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      // Listener events are async; sleep-drain between queries. A
      // straggler task-end posted after the reset bleeds into the
      // next query's counter — tolerable for a dev audit tool (the
      // race-free form, listenerBus.waitUntilEmpty, is private[spark]);
      // treat ±one-task noise as such when reading results.
      Thread.sleep(1000)
      bytes.set(0); records.set(0)
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      Thread.sleep(1000)
      println(f"SCANAUDIT $name%-28s bytesRead=${bytes.get}%12d " +
        f"recordsRead=${records.get}%10d")
    }
    spark.stop()
  }
}
