package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under an sf dir.
  *
  * At 100 TB these would be partitioned lakehouse tables; the loader is
  * the single seam where partition pruning / bucketing options attach,
  * so nothing else in the engine hard-codes paths.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** Session conf every graft session needs, applied once at build time
    * (a loader mutating session conf mid-query would silently change the
    * behavior of later reads): `events.ts` is parquet TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects — read it as a raw long. */
  val RequiredConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  /** `events.ts` is parquet TIMESTAMP(NANOS) (read as raw long via
    * [[RequiredConf]]); keep the exact nanosecond value as `ts_ns` for
    * ordering, and expose a micro-truncated TimestampType `ts` for date
    * math/formatting. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(
      s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"),
      "set graft.core.Tables.RequiredConf on the SparkSession builder")
    load(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
