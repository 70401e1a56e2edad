package graft.io

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpecBase

class CsvSinkSpec extends SparkSpecBase {

  test("timestamps serialize in the reference's %Y-%m-%d %H:%M:%S.%f form") {
    val dir = Files.createTempDirectory("csvsink").toString + "/out"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, java.sql.Timestamp.valueOf("2025-03-05 07:45:00.123456")),
        Row(2L, null)), 1),
      StructType(Seq(
        StructField("id", LongType),
        StructField("ts", TimestampType))))
    CsvSink.write(df, dir)
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines.contains("id,ts"))
    assert(lines.contains("1,2025-03-05 07:45:00.123456"))
    assert(lines.contains("2,\"\"") || lines.contains("2,"))
    // round-trip: same value back through the engine's multi-format parse
    val back = spark.read.option("header", "true")
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("ts", StringType))))
      .csv(dir)
      .select(graft.core.Conversions.parseTimestampMulti(
        org.apache.spark.sql.functions.col("ts")).as("p"))
      .collect().flatMap(r => Option(r.get(0))).toSet
    assert(back == Set(java.sql.Timestamp.valueOf("2025-03-05 07:45:00.123456")))
  }
}
