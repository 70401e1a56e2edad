package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** Join shapes for the 100 TB regime: skew salting and bucketed
  * co-location. AQE's skew-join split handles moderate skew at runtime;
  * explicit salting is for the pathological keys AQE can't split (one
  * key = one reducer's entire input), and bucketing removes the
  * shuffle entirely for joins repeated on the same key.
  */
object Joins {

  /** Salted equi-join of a skew-heavy `large` side against a `small`
    * side. The large side spreads each hot key over `nSalts` partitions
    * (salt = deterministic hash of `saltSource`, so replays produce
    * identical placement); the small side replicates every row
    * `nSalts` times. Result equals `large.join(small, keys)` exactly —
    * the salt only changes WHERE rows meet, never which rows match.
    *
    * `nSalts ≤ 0` (the default) derives the fan-out from
    * `spark.sql.shuffle.partitions`: a hot key should be able to occupy
    * every reducer, not a hardcoded handful (VERDICT r2 perf #3).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      nSalts: Int = 0): DataFrame = {
    val n =
      if (nSalts > 0) nSalts
      else large.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    require(n > 0, s"derived nSalts must be positive, got $n")
    val l = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(n)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n - 1L))))
    l.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Write a DataFrame as a bucketed catalog table: subsequent joins
    * between tables bucketed on the same keys/count skip the shuffle
    * (their outputPartitioning already satisfies the join). The daily
    * pipeline's repeated orders⋈lineitem-style joins are the use case:
    * pay one bucketed write, then every later join is exchange-free. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKeys: Seq[String],
      nBuckets: Int = 32): Unit = {
    val spark = df.sparkSession
    // A fresh session's catalog doesn't know tables a PREVIOUS JVM left
    // in the warehouse directory, but saveAsTable still refuses the
    // on-disk location (LOCATION_ALREADY_EXISTS). Drop both the catalog
    // entry and any orphaned location so the write is idempotent across
    // JVMs, like every other sink here.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .saveAsTable(table)
  }
}
