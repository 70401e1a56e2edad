package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Distribution statistics for the 100 TB regime.
  *
  * Exact quantiles need a full sort (or Spark's `percentile`, which
  * collects per-group value multisets); `approx_percentile` is
  * KLL/GK-based and no external engine can reproduce its estimate.
  * The histogram quantile here is the classic fixed-bin compromise:
  * one narrow shuffle of (group, bin-id, count) integer triples —
  * bounded state like a sketch, error bounded by the bin width — and
  * every arithmetic step is integer counts + one closed-form
  * interpolation, so the estimate is DETERMINISTIC and replicable in
  * DuckDB SQL for the value-level gate.
  */
object Stats {

  /** Quantile estimates from a fixed-domain equal-width histogram.
    *
    * Values are clamped into `nBins` bins over [lo, hi); the q-th
    * quantile interpolates linearly inside the first bin whose
    * cumulative count reaches q·N:
    * `lo + width·(bin + (qN − cumBefore)/binCount)`.
    *
    * Returns one row per group: (groupCols*, n, q_<label> per q).
    * Cost: one map-side-combined groupBy on (group, bin) — at any
    * scale the shuffle carries ≤ |groups|·nBins integer rows.
    */
  def histogramQuantiles(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      qs: Seq[(String, Double)],
      lo: Double,
      hi: Double,
      nBins: Int = 100): DataFrame = {
    require(hi > lo && nBins > 0)
    val width = (hi - lo) / nBins
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((col(valueCol).cast(DoubleType) - lo) / width).cast(IntegerType)))
    val counts = df
      .groupBy((groupCols.map(col) :+ bin.as("__bin")): _*)
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__bin").asc)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val qCols = qs.map { case (label, q) =>
      val target = lit(q) * col("__n")
      // EXACTLY the first bin reaching the target: cumBefore < qN ≤ cum
      // (later bins would interpolate with a negative fraction and a
      // bare min() could pick them)
      val hit = col("__cum") >= target &&
        (col("__cum") - col("__c")) < target
      val est = lit(lo) + lit(width) *
        (col("__bin") + (target - (col("__cum") - col("__c"))) / col("__c"))
      min(when(hit, round(est, 6))).as(s"q_$label")
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"), qCols: _*)
  }
}
