package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.SparkSpecBase

class DateCastRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private def frame = Seq(
    (1L, Timestamp.valueOf("1996-03-15 00:00:00")), // day start: inside
    (2L, Timestamp.valueOf("1996-03-15 23:59:59")), // day end: inside
    (3L, Timestamp.valueOf("1996-03-16 00:00:00")), // next day start: out
    (4L, Timestamp.valueOf("1996-03-14 23:59:59")), // prev day end: out
    (5L, null.asInstanceOf[Timestamp])              // NULL: out
  ).toDF("id", "ts")

  test("CAST(ts AS DATE) = d rewrites to a sargable half-open range") {
    val q = frame.filter(
      col("ts").cast(DateType) === lit("1996-03-15").cast(DateType))
    // over a LocalRelation the rewritten filter constant-folds away
    // entirely (ConvertToLocalRelation) — the cast must be gone and
    // the boundary semantics exact; the parquet test below proves the
    // surviving range shape reaches a real scan
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("cast(ts"),
      s"cast survived optimization:\n$opt")
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("reversed operand order rewrites too") {
    val q = frame.filter(
      lit("1996-03-15").cast(DateType) === col("ts").cast(DateType))
    assert(!q.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("cast(ts"))
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("rewritten predicate reaches the parquet scan as pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dcr").toString
    frame.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(
      col("ts").cast(DateType) === lit("1996-03-15").cast(DateType))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts") &&
      plan.contains("LessThan(ts"),
      s"range must be in PushedFilters:\n$plan")
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("non-equality and non-timestamp casts are left alone") {
    // date-typed column: CAST is a no-op Catalyst removes itself, but
    // the rule must not touch inequality comparisons on timestamps
    val q = frame.filter(
      col("ts").cast(DateType) > lit("1996-03-14").cast(DateType))
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
