package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sub-step attribution for q_fdr_bh's steady-state cost (VERDICT r14
  * item 6): the operator's only eager work at build time is the cells
  * collect; time it separately from the full query. */
object FdrProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-fdr-prof")
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val rows = Tables.documents(spark, dir)
        .select(col("source").cast(StringType).as("__g"),
          col("doc_id").cast(LongType).as("__u"),
          when(coalesce(col("n_chars") >= 400, lit(false)), 1L)
            .otherwise(0L).as("__y"))
        .filter(col("__g").isNotNull && col("__u").isNotNull)
      val cells = rows.groupBy(col("__g"))
        .agg(count(lit(1)).as("__n"),
          coalesce(sum(col("__y")), lit(0L)).as("__k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = cells.agg(coalesce(sum(col("__n")), lit(0L)),
        coalesce(sum(col("__k")), lit(0L))).collect()(0)
      val tCells = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q_fdr_bh")(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"FDRPROF rep=$i cellsCollect=$tCells%.3f " +
        f"fullBuild=$tBuild%.3f exec=$tExec%.3f tot=${tot.toString}")
      cells.unpersist()
    }
    spark.stop()
  }
}
