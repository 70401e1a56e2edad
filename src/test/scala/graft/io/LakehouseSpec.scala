package graft.io

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Tables

class LakehouseSpec extends SparkSpecBase {

  test("date-partitioned layout prunes the scan to one partition") {
    val path = Files.createTempDirectory("lake").toString + "/orders"
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
    Lakehouse.writeDatePartitioned(src, "o_orderdate", path)

    val day = Lakehouse.readDay(spark, path, "1996-03-09")
    // correctness: the partition read equals the row-filter read
    assert(day.count() ==
      src.filter(org.apache.spark.sql.functions.to_date(
        src("o_orderdate")) === "1996-03-09").count())
    assert(day.count() > 0)

    // the plan must prune on the partition column, not post-filter
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("ds"), plan)
    val scanned = day.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned == Seq(1), s"expected exactly one partition, got $scanned")
  }
}
