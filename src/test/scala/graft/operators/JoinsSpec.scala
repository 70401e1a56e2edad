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

  test("asofJoin: backward inclusive match, per-key, NULL-safe") {
    import spark.implicits._
    val left = Seq(
      (1, "2024-01-01 10:00:00", 1),
      (1, "2024-01-01 12:00:00", 2),
      (1, "2024-01-01 11:00:00", 5),   // equal-ts tie with right ts
      (2, "2024-01-01 10:00:00", 3),   // key with no right rows
      (1, null.asInstanceOf[String], 4)) // NULL left ts matches nothing
      .toDF("k", "lts", "lv")
      .withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq(
      (1, "2024-01-01 09:00:00", 10),
      (1, "2024-01-01 11:00:00", 20),
      (3, "2024-01-01 09:00:00", 30),  // key absent on the left
      (1, null.asInstanceOf[String], 99)) // NULL right ts: dropped
      .toDF("k", "rts", "rv")
      .withColumn("rts", col("rts").cast("timestamp"))
    val got = Joins.asofJoin(left, right, Seq("k"), "lts", "rts")
      .select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).sorted.toSeq
    // lv=1 @10:00 → rv=10 (@09:00); lv=5 @11:00 → rv=20 (inclusive tie);
    // lv=2 @12:00 → rv=20; lv=3 (key 2) → none; lv=4 (NULL ts) → none
    assert(got == Seq((1, 1, 10), (1, 2, 20), (1, 4, -1), (1, 5, 20),
      (2, 3, -1)))
  }

  test("asofJoin tolerance: stale matches NULL-extend instead of " +
      "re-matching older candidates; exact-boundary gap kept") {
    import spark.implicits._
    val left = Seq(
      (1, "2024-01-01 10:00:00", 1),  // 60 min from 09:00 → stale
      (1, "2024-01-01 09:30:00", 2),  // exactly 30 min → kept
      (1, "2024-01-01 09:10:00", 3))  // 10 min → kept
      .toDF("k", "lts", "lv")
      .withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq(
      (1, "2024-01-01 08:00:00", 5),  // even older fallback: must NOT
      (1, "2024-01-01 09:00:00", 10)) // be used when 09:00 is stale
      .toDF("k", "rts", "rv")
      .withColumn("rts", col("rts").cast("timestamp"))
    val tol = Some(30L * 60 * 1000 * 1000)
    val got = Joins.asofJoin(left, right, Seq("k"), "lts", "rts",
        toleranceUs = tol)
      .select("lv", "rv").collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).sorted.toSeq
    assert(got == Seq(1 -> -1, 2 -> 10, 3 -> 10))
    // forward direction: same guard on the ≥ match
    val fwd = Joins.asofJoinForward(
      Seq((1, "2024-01-01 07:00:00", 9)).toDF("k", "lts", "lv")
        .withColumn("lts", col("lts").cast("timestamp")),
      right, Seq("k"), "lts", "rts", toleranceUs = tol)
      .select("rv").collect()
    assert(fwd.length == 1 && fwd(0).isNullAt(0)) // 08:00 is 60 min out
  }

  test("asofJoin: NULL keys never match (SQL join semantics)") {
    import spark.implicits._
    val left = Seq(
      (Some(1), "2024-01-01 10:00:00", 1),
      (None, "2024-01-01 10:00:00", 2)) // NULL key matches nothing
      .toDF("k", "lts", "lv")
      .withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq(
      (Some(1), "2024-01-01 09:00:00", 10),
      (None, "2024-01-01 09:00:00", 99)) // NULL-key right row ignored
      .toDF("k", "rts", "rv")
      .withColumn("rts", col("rts").cast("timestamp"))
    val got = Joins.asofJoin(left, right, Seq("k"), "lts", "rts")
      .select("lv", "rv").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
      .sorted.toSeq
    assert(got == Seq((1, 10), (2, -1)))
  }

  test("asofJoinForward: inclusive next-match, per-key, NULL-safe") {
    import spark.implicits._
    val left = Seq(
      (1, "2024-01-01 10:00:00", 1),   // next right @11:00
      (1, "2024-01-01 12:00:00", 2),   // nothing after → none
      (1, "2024-01-01 11:00:00", 5),   // equal-ts inclusive tie
      (2, "2024-01-01 10:00:00", 3),   // key with no right rows
      (1, null.asInstanceOf[String], 4)) // NULL left ts matches nothing
      .toDF("k", "lts", "lv")
      .withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq(
      (1, "2024-01-01 09:00:00", 10),  // before everything: only lv=? none
      (1, "2024-01-01 11:00:00", 20),
      (3, "2024-01-01 09:00:00", 30),
      (1, null.asInstanceOf[String], 99)) // NULL right ts: dropped
      .toDF("k", "rts", "rv")
      .withColumn("rts", col("rts").cast("timestamp"))
    val got = Joins.asofJoinForward(left, right, Seq("k"), "lts", "rts")
      .select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).sorted.toSeq
    // lv=1 @10:00 → rv=20 (@11:00); lv=5 @11:00 → rv=20 (inclusive);
    // lv=2 @12:00 → none; lv=3 (key 2) → none; lv=4 (NULL ts) → none
    assert(got == Seq((1, 1, 20), (1, 2, -1), (1, 4, -1), (1, 5, 20),
      (2, 3, -1)))
  }

  test("asofJoinForward agrees with the quadratic reference") {
    import spark.implicits._
    val left = spark.range(200).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id"), lit("l")), lit(100000L))).as("lts"),
      col("id").as("lv"))
    val right = spark.range(80).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id"), lit("r")), lit(100000L))).as("rts"),
      col("id").as("rv"))
    val got = Joins.asofJoinForward(left, right, Seq("k"), "lts", "rts")
      .select("k", "lv", "rv", "rts")
    // reference: per left row, min-rts right row with rts >= lts
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("rts") >= col("lts"), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l.k", "lv")
          .orderBy(col("rts").asc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col("l.k"), col("lv"), col("rv"), col("rts"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    assert(got.count() == 200)
  }

  test("asofJoin agrees with the quadratic reference implementation") {
    // Property-style check on a pseudo-random dataset: the merge
    // formulation must equal the obvious O(n·m) definition.
    import spark.implicits._
    val left = spark.range(200).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id"), lit("l")), lit(100000L))).as("lts"),
      col("id").as("lv"))
    val right = spark.range(80).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id"), lit("r")), lit(100000L))).as("rts"),
      col("id").as("rv"))
    val got = Joins.asofJoin(left, right, Seq("k"), "lts", "rts")
      .select("k", "lv", "rv", "rts")
    // reference: per left row, max-rts right row with rts <= lts
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("rts") <= col("lts"), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l.k", "lv")
          .orderBy(col("rts").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col("l.k"), col("lv"), col("rv"), col("rts"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    assert(got.count() == 200)
  }

  test("rangeJoin equals the naive inequality join across bin widths") {
    import spark.implicits._
    val points = spark.range(500).select(
      col("id").as("pid"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id"), lit("p")), lit(50000L))).as("pts"))
    val intervals = spark.range(40).select(
      col("id").as("iid"),
      timestamp_seconds(lit(1700000000L) +
        pmod(xxhash64(col("id"), lit("i")), lit(50000L))).as("s"))
      .withColumn("e", col("s") + expr("INTERVAL 37 MINUTES"))
    val naive = points.join(intervals,
        col("pts") >= col("s") && col("pts") <= col("e"))
      .select("pid", "iid")
    for (binSec <- Seq(60L, 600L, 2220L, 7200L)) {
      val got = Joins.rangeJoin(points, "pts", intervals, "s", "e", binSec)
        .select("pid", "iid")
      assert(got.exceptAll(naive).count() == 0, s"extra rows at bin=$binSec")
      assert(naive.exceptAll(got).count() == 0, s"missing rows at bin=$binSec")
    }
    assert(naive.count() > 0)
  }

  test("keySkewProfile: exact counts, deterministic hot key, " +
      "ceil salt fan-out; uniform keys suggest 1 salt") {
    import spark.implicits._
    // key 7 holds 6 of 10 rows; keys 1..4 hold one each
    val skewed = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 4L))
      .toDF("k2")
    val r = Joins.keySkewProfile(skewed, col("k2")).collect()(0)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_keys") == 5L)
    assert(r.getAs[Long]("max_cnt") == 6L)
    assert(r.getAs[String]("hot_key") == "7")
    assert(r.getAs[Long]("avg_cnt_x100") == 200L) // avg 2.0
    assert(r.getAs[Long]("skew_x100") == 300L) // max/avg = 3.0
    assert(r.getAs[Long]("suggested_salts") == 3L) // ceil(6/2)
    // uniform: every key once -> skew 1.0, one salt (= don't salt);
    // hot-key tie breaks to the smallest key
    val uni = Seq(5L, 6L, 7L).toDF("k2")
    val u = Joins.keySkewProfile(uni, col("k2")).collect()(0)
    assert(u.getAs[Long]("skew_x100") == 100L)
    assert(u.getAs[Long]("suggested_salts") == 1L)
    assert(u.getAs[String]("hot_key") == "5")
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

  test("intervalOverlapJoin equals the naive cross filter — " +
      "exactly-once pairs at any bin size, touching ends inclusive") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    // spans in minutes: overlaps, nesting, exact-touch, disjoint
    val lefts = Seq((1L, 0, 30), (2L, 10, 20), (3L, 40, 50),
      (4L, 60, 60), (5L, 100, 130))
      .map { case (id, a, b) => (id, ts(a), ts(b)) }
      .toDF("lid", "ls", "le")
    val rights = Seq((10L, 25, 45), (11L, 50, 60), (12L, 200, 210),
      (13L, 15, 15))
      .map { case (id, a, b) => (id, ts(a), ts(b)) }
      .toDF("rid", "rs", "re")
    val naive = lefts.crossJoin(rights)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    for (binSec <- Seq(60L, 600L, 3600L, 86400L)) {
      val got = Joins.intervalOverlapJoin(
        lefts, "ls", "le", rights, "rs", "re", binSec)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == naive.toSeq, s"binSeconds=$binSec")
      assert(got.length == got.distinct.length,
        s"duplicate pairs at binSeconds=$binSec")
    }
    // sanity on the fixture: touch case 3–11 (50 == 50) present,
    // point-in-span 13 inside 1 and 2, disjoint 12 absent
    assert(naive.contains((3L, 11L)) && naive.contains((1L, 13L)) &&
      naive.contains((2L, 13L)))
    assert(!naive.exists(_._2 == 12L))
  }

  test("intervalOverlapJoin: a pathological interval trips the bin " +
      "fan-out guard instead of exploding (VERDICT r8 item 4)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lefts = Seq((1L, ts("2024-01-01 00:00:00"),
      ts("2024-12-31 00:00:00"))).toDF("lid", "ls", "le") // ~1 year
    val rights = Seq((10L, ts("2024-06-01 00:00:00"),
      ts("2024-06-01 01:00:00"))).toDF("rid", "rs", "re")
    // a year-long span at a 1-hour bin is ~8,760 copies — over the
    // default 4096 cap; the guard names the offending side
    val e = intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(lefts, "ls", "le", rights, "rs", "re",
        binSeconds = 3600L)
    }
    assert(e.getMessage.contains("left side"))
    // widening the bin toward the span length passes and still joins
    val ok = Joins.intervalOverlapJoin(lefts, "ls", "le",
      rights, "rs", "re", binSeconds = 7 * 86400L)
      .select("lid", "rid").collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L)))
    // and a deliberate cap raise also passes
    val ok2 = Joins.intervalOverlapJoin(lefts, "ls", "le",
      rights, "rs", "re", binSeconds = 3600L,
      maxBinsPerInterval = 10000L)
      .select("lid", "rid").collect()
    assert(ok2.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L)))
  }

  test("asofJoinNearest: picks the closer side, backward wins exact " +
    "ties, tolerance NULL-extends, empty sides NULL-safe") {
    import spark.implicits._
    val left = Seq(
      (1, "2024-01-01 10:00:00", 1),  // 09:30 (30m back) vs 11:00 -> back
      (1, "2024-01-01 10:50:00", 2),  // 11:00 (10m fwd) closer than 09:30
      (1, "2024-01-01 10:15:00", 3),  // 09:30 vs 11:00 equidistant -> back
      (2, "2024-01-01 10:00:00", 4),  // only a FORWARD candidate exists
      (3, "2024-01-01 10:00:00", 5))  // key with no right rows
      .toDF("k", "lts", "lv")
      .withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq(
      (1, "2024-01-01 09:30:00", 10),
      (1, "2024-01-01 11:00:00", 20),
      (2, "2024-01-01 10:45:00", 30))
      .toDF("k", "rts", "rv")
      .withColumn("rts", col("rts").cast("timestamp"))
    def run(tol: Option[Long]) =
      Joins.asofJoinNearest(left, right, Seq("k"), "lts", "rts", tol)
        .select("k", "lv", "rv")
        .collect().map(r => (r.getInt(0), r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2))).sorted.toSeq
    assert(run(None) == Seq((1, 1, 10), (1, 2, 20), (1, 3, 10),
      (2, 4, 30), (3, 5, -1)))
    // 20-minute tolerance: only the 10m-forward and 45m... only
    // gaps <= 20m survive (lv=2 at 10m); the rest NULL-extend
    assert(run(Some(20L * 60 * 1000000)) ==
      Seq((1, 1, -1), (1, 2, 20), (1, 3, -1), (2, 4, -1), (3, 5, -1)))
  }
}
