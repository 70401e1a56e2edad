package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class JoinsSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the plain join's rows under skew") {
    // lineitem⋈orders with everything mapped onto very few keys —
    // worst-case skew — must still match the unsalted join.
    val large = Tables.lineitem(spark, dir)
      .withColumn("k", col("l_orderkey") % 3)
      .select("k", "l_orderkey", "l_extendedprice")
    val small = Tables.orders(spark, dir).limit(50)
      .withColumn("k", col("o_orderkey") % 3)
      .select("k", "o_orderkey")
    val plain = large.join(small, Seq("k"))
      .select("l_orderkey", "o_orderkey").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1))).sorted
    val salted = Joins.saltedJoin(large, small, Seq("k"),
        saltSource = col("l_orderkey"), nSalts = 8)
      .select("l_orderkey", "o_orderkey").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Joins.writeBucketed(
        Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
        "b_orders", Seq("o_orderkey"), nBuckets = 4)
      Joins.writeBucketed(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        "b_lineitem", Seq("l_orderkey"), nBuckets = 4)
      val joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
