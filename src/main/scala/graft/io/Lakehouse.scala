package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-partitioned parquet layout — the lakehouse form of the
  * reference's daily slicing (SURVEY §1.4 option b): the run-date
  * predicate becomes PARTITION PRUNING (directories never listed)
  * instead of a row filter, which is the only version of "incremental
  * extract" that survives 100 TB.
  */
object Lakehouse {

  /** Write `df` partitioned by the DATE of `tsCol` (a `ds=YYYY-MM-DD`
    * directory per day, Hive layout). */
  def writeDatePartitioned(
      df: DataFrame,
      tsCol: String,
      path: String): Unit =
    df.withColumn("ds", to_date(col(tsCol)))
      .write
      .mode("overwrite")
      .partitionBy("ds")
      .parquet(path)

  /** Read one day back: the `ds` equality prunes to a single
    * directory — verify with explain(): `PartitionFilters: [isnotnull
    * (ds), (ds = ...)]` and one partition scanned. */
  def readDay(spark: SparkSession, path: String, date: String): DataFrame =
    spark.read.parquet(path).filter(col("ds") === lit(date))
}
