package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  test("validate: NULL predicate results count as violations") {
    val df = Seq(
      (Some(5L), "a"), (None, "b"), (Some(-1L), "c"), (Some(2L), null))
      .toDF("v", "s")
    val got = Expectations.validate(df, Seq(
      Expectations.Expect("v_positive", col("v") > 0),   // NULL → violation
      Expectations.Expect("s_not_null", col("s").isNotNull)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // v > 0: row2 NULL (violation), row3 -1 (violation) → 2
    assert(got("v_positive") == ((4L, 2L)))
    assert(got("s_not_null") == ((4L, 1L)))
  }

  test("validate: all-pass contract reports zero violations") {
    val df = (1L to 50L).toDF("v")
    val got = Expectations.validate(df,
      Seq(Expectations.Expect("pos", col("v") > 0))).collect().head
    assert(got.getLong(1) == 50L && got.getLong(2) == 0L)
  }

  test("validate: an empty batch reports zero violations, not NULL") {
    val df = Seq((1L, "a")).toDF("v", "s").filter(col("v") < 0)
    val got = Expectations.validate(df,
      Seq(Expectations.Expect("pos", col("v") > 0))).collect().head
    assert(!got.isNullAt(2), "empty-batch violation count must not be NULL")
    assert(got.getLong(1) == 0L && got.getLong(2) == 0L)
  }

  test("duplicateKeys: only keys with more than one row surface") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w"), (3L, "v"),
      (3L, "u")).toDF("k", "p")
    val got = Expectations.duplicateKeys(df, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 3L)))
  }

  test("observedValidate: violation counts ride the action for free " +
      "and match validate()") {
    val df = Seq(
      (Some(5L), "a"), (None, "b"), (Some(-1L), "c"), (Some(2L), null))
      .toDF("v", "s")
    val checks = Seq(
      Expectations.Expect("v_positive", col("v") > 0),
      Expectations.Expect("s_not_null", col("s").isNotNull))
    val obs = org.apache.spark.sql.Observation("contracts")
    val observed = Expectations.observedValidate(df, obs, checks)
    observed.write.mode("overwrite").format("noop").save() // the action
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("v_v_positive") == 2L && m("v_s_not_null") == 1L)
    // identical numbers to the standalone one-pass validator
    val standalone = Expectations.validate(df, checks)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(standalone == Map("v_positive" -> 2L, "s_not_null" -> 1L))
  }

  test("orphanKeys: missing parents surface with row counts; " +
      "NULL child keys are reported; clean FK yields nothing") {
    val child = Seq(Option(1L), Option(1L), Option(2L), Option(9L),
      Option(9L), Option(9L), None).toDF("fk0")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Expectations.orphanKeys(child, col("fk0"),
        parent, col("pk"))
      .collect().map(r =>
        Option(r.getAs[Any]("fk")).map(_.asInstanceOf[Long]) ->
          r.getAs[Long]("n_rows")).toMap
    // 9 has no parent (3 rows); the NULL key cannot reference (1 row)
    assert(got == Map(Some(9L) -> 3L, None -> 1L))
    val clean = Expectations.orphanKeys(
      Seq(1L, 2L).toDF("fk0"), col("fk0"), parent, col("pk"))
    assert(clean.count() == 0L)
  }

  test("anonymityAudit: hand-computed class sizes and diversity; " +
      "NULL sensitive values do not count toward l") {
    // classes by (city): A = 3 rows {s1, s2, s2} → nd 2;
    //                    B = 1 row  {s1}         → nd 1 (small + low)
    //                    C = 2 rows {NULL, s9}   → nd 1 (low div only)
    val df = Seq(
      ("A", Option("s1")), ("A", Option("s2")), ("A", Option("s2")),
      ("B", Option("s1")),
      ("C", Option.empty[String]), ("C", Option("s9"))
    ).toDF("city", "sens")
    val r = Expectations.anonymityAudit(df, Seq("city"), "sens",
      k = 2L, l = 2L).collect()(0)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("min_class_size") == 1L)
    assert(r.getAs[Long]("n_small_classes") == 1L) // B only
    assert(r.getAs[Long]("at_risk_ppm") == 166666L) // 1/6
    assert(r.getAs[Long]("min_diversity") == 1L)
    assert(r.getAs[Long]("n_low_div_classes") == 2L) // B and C
    assert(r.getAs[Long]("low_div_ppm") == 500000L) // 3/6
  }
}
