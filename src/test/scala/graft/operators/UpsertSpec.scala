package graft.operators

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpecBase

/** Property tests for the three upsert modes against an independent
  * in-memory (Scala Map) model, plus the reference's documented
  * invariants (SURVEY.md §2.5, §5): idempotency
  * `apply(apply(t,b),b) == apply(t,b)` and last-write-wins
  * batch-order commutativity.
  *
  * Generators are driven with explicit seeds (the scalatest-scalacheck
  * bridge isn't on the offline classpath) — deterministic, replayable
  * cases.
  */
class UpsertSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("ts", LongType),   // ordering column (nullable)
    StructField("v", StringType)))

  private case class R(k: Long, ts: Option[Long], v: String) {
    def row: Row = Row(k, ts.map(Long.box).orNull, v)
  }

  private val genRow: Gen[R] = for {
    k <- Gen.choose(0L, 12L) // small key space forces collisions
    ts <- Gen.option(Gen.choose(0L, 5L))
    v <- Gen.alphaStr.map(_.take(4))
  } yield R(k, ts, v)

  /** unique keys per side, like the reference's one-row-per-PK batches */
  private val genSide: Gen[Seq[R]] =
    Gen.listOf(genRow).map(_.groupBy(_.k).map(_._2.head).toSeq)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator failed"))

  private def df(rows: Seq[R]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(_.row), 2), schema)

  private def collect(d: DataFrame): Set[(Long, Option[Long], String)] =
    d.collect().toSet.map { r: Row =>
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), r.getString(2))
    }

  /** Independent model: plain Map merge per mode. */
  private def model(
      target: Seq[R], batch: Seq[R],
      mode: Upsert.Mode): Set[(Long, Option[Long], String)] = {
    val t = target.map(r => r.k -> r).toMap
    val merged = batch.foldLeft(t) { (acc, s) =>
      acc.get(s.k) match {
        case None => acc + (s.k -> s)
        case Some(old) =>
          mode match {
            case Upsert.Unconditional => acc + (s.k -> s)
            case Upsert.LastWriteWins(_) =>
              val wins = old.ts.isEmpty ||
                (s.ts.nonEmpty && s.ts.get > old.ts.get)
              acc + (s.k -> (if (wins) s else old))
            case Upsert.InsertOnly(frozen) =>
              val nv = if (frozen.contains("v")) old.v else s.v
              val nts = if (frozen.contains("ts")) old.ts else s.ts
              acc + (s.k -> R(s.k, nts, nv))
          }
      }
    }
    merged.values.map(r => (r.k, r.ts, r.v)).toSet
  }

  private val modes = Seq[Upsert.Mode](
    Upsert.Unconditional,
    Upsert.LastWriteWins("ts"),
    Upsert.InsertOnly(Seq("v")))

  test("all modes match the independent Map model") {
    for (seed <- 1L to 12L; mode <- modes) {
      val t = sample(genSide, seed); val b = sample(genSide, seed + 100)
      val got = collect(Upsert(df(t), df(b), Seq("k"), mode))
      assert(got == model(t, b, mode),
        s"seed=$seed mode=$mode target=$t batch=$b")
    }
  }

  test("idempotency: applying the same batch twice is a no-op (O5)") {
    for (seed <- 1L to 8L; mode <- modes) {
      val t = sample(genSide, seed); val b = sample(genSide, seed + 200)
      val once = Upsert(df(t), df(b), Seq("k"), mode)
      val twice = Upsert(once, df(b), Seq("k"), mode)
      assert(collect(twice) == collect(once), s"seed=$seed mode=$mode")
    }
  }

  test("scd2History: versions chain, exactly one current row per key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val changes = Seq(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-02 10:00:00"),
      (1L, "2024-01-05 10:00:00"),
      (2L, "2024-01-03 10:00:00"))
      .toDF("k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val h = Upsert.scd2History(changes, Seq("k"), "ts")
    // one current row per key; every non-current valid_to equals the
    // next version's valid_from; intervals never overlap
    assert(h.filter(col("is_current")).count() == 2)
    assert(h.filter(col("is_current") && col("valid_to").isNotNull)
      .count() == 0)
    val k1 = h.filter(col("k") === 1).orderBy(col("valid_from"))
      .select(date_format(col("valid_from"), "MM-dd").as("f"),
        date_format(col("valid_to"), "MM-dd").as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(k1 == Seq(("01-01", "01-02"), ("01-02", "01-05"),
      ("01-05", null)))
  }

  test("LWW: for ts-total batches, application order does not matter") {
    // rows with ts always defined and distinct per key across batches —
    // the guarantee surface (NULL/tie cases resolve toward the target)
    val genTsRow = for {
      k <- Gen.choose(0L, 6L); ts <- Gen.choose(0L, 100L)
      v <- Gen.alphaStr.map(_.take(3))
    } yield R(k, Some(ts), v)
    val genTsSide = Gen.listOf(genTsRow).map(
      _.groupBy(_.k).map(_._2.head).toSeq)
    var checked = 0
    var seed = 0L
    while (checked < 8 && seed < 60) {
      seed += 1
      val t = sample(genTsSide, seed)
      val b1 = sample(genTsSide, seed + 300)
      val b2 = sample(genTsSide, seed + 600)
      val clash = (b1 ++ b2).groupBy(_.k).values
        .exists(g => g.map(_.ts).distinct.size != g.size)
      if (!clash) {
        checked += 1
        val m = Upsert.LastWriteWins("ts")
        val ab = Upsert(Upsert(df(t), df(b1), Seq("k"), m), df(b2), Seq("k"), m)
        val ba = Upsert(Upsert(df(t), df(b2), Seq("k"), m), df(b1), Seq("k"), m)
        assert(collect(ab) == collect(ba), s"seed=$seed")
      }
    }
    assert(checked >= 8, "not enough clash-free samples generated")
  }

  test("LWW NULL-ordering disjunct: exhaustive (t.ts, s.ts) quadrants " +
      "pin `t.ts IS NULL OR EXCLUDED.ts > t.ts` (SURVEY §7.4 risk 4)") {
    // Every combination of NULL/0..2 on both sides of one matched key:
    //  - target ts NULL        → source wins (even when source ts is
    //    also NULL — the reference's disjunct short-circuits);
    //  - both set              → strictly-greater wins; TIE keeps the
    //    target (no update churn on equal timestamps);
    //  - target set, source NULL → `NULL > ts` is SQL-NULL → target
    //    keeps (a stale NULL-stamped replica row can never clobber).
    val m = Upsert.LastWriteWins("ts")
    val stamps: Seq[Option[Long]] = None +: (0L to 2L).map(Some(_))
    for (tTs <- stamps; sTs <- stamps) {
      val t = Seq(R(1L, tTs, "old"))
      val b = Seq(R(1L, sTs, "new"))
      val got = collect(Upsert(df(t), df(b), Seq("k"), m))
      val sourceWins = tTs.isEmpty ||
        (sTs.nonEmpty && sTs.get > tTs.get)
      val want = if (sourceWins) Set((1L, sTs, "new"))
                 else Set((1L, tTs, "old"))
      assert(got == want, s"t.ts=$tTs s.ts=$sTs")
    }
  }

  test("LWW property: NULL-and-tie-dense random batches match the " +
      "Map model (seeded ScalaCheck)") {
    // A generator biased toward the disjunct's edge cases: half the
    // timestamps NULL, the rest drawn from {0,1} so ties and
    // both-NULL matches occur constantly.
    val genEdgeRow = for {
      k <- Gen.choose(0L, 5L)
      ts <- Gen.oneOf(Gen.const(None),
        Gen.choose(0L, 1L).map(Some(_)))
      v <- Gen.alphaStr.map(_.take(3))
    } yield R(k, ts, v)
    val genEdgeSide = Gen.listOf(genEdgeRow).map(
      _.groupBy(_.k).map(_._2.head).toSeq)
    val m = Upsert.LastWriteWins("ts")
    for (seed <- 1L to 16L) {
      val t = sample(genEdgeSide, seed)
      val b = sample(genEdgeSide, seed + 900)
      val got = collect(Upsert(df(t), df(b), Seq("k"), m))
      assert(got == model(t, b, m), s"seed=$seed target=$t batch=$b")
    }
  }

  test("applyChangelog: greatest seq wins, D removes, re-insert revives") {
    import spark.implicits._
    val log = Seq(
      (1L, "a", 1L, "I"), (1L, "b", 2L, "U"),          // update wins
      (2L, "c", 1L, "I"), (2L, "c", 2L, "D"),          // deleted
      (3L, "d", 1L, "I"), (3L, "d", 2L, "D"), (3L, "e", 3L, "I"), // revived
      (4L, "f", 1L, "I"))                              // plain insert
      .toDF("k", "v", "seq", "op")
    val got = Upsert.applyChangelog(log, Seq("k"), "seq", "op")
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "b"), (3L, "e"), (4L, "f")))
  }

  test("applyChangelog matches the independent model (property)") {
    // model: per key, the (seq desc, op desc) max row decides; D absent
    val genChange: Gen[(Long, Long, String, String)] = for {
      k <- Gen.choose(0L, 5L)
      seq <- Gen.choose(1L, 6L)
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.alphaStr.map(_.take(3))
    } yield (k, seq, op, v)
    val genLog = Gen.nonEmptyListOf(genChange).map(
      // unique (k, seq): the documented contract (duplicate sequences
      // per key resolve by op desc, but generators keep it clean)
      _.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq)
    for (seed <- 1L to 10L) {
      val log = sample(genLog, seed + 900)
      val model = log.groupBy(_._1).flatMap { case (k, rows) =>
        val win = rows.maxBy(r => (r._2, r._3))
        if (win._3 == "D") None else Some((k, win._2, win._3, win._4))
      }.toSet
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          log.map(t => Row(t._1, t._2, t._3, t._4)), 2),
        StructType(Seq(StructField("k", LongType),
          StructField("seq", LongType), StructField("op", StringType),
          StructField("v", StringType))))
      val got = Upsert.applyChangelog(df, Seq("k"), "seq", "op")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      assert(got == model, s"seed=$seed log=$log")
    }
  }

  test("latestPerKey keeps the newest row per key") {
    val rows = Seq(
      R(1, Some(1), "old"), R(1, Some(5), "new"),
      R(2, Some(2), "only"), R(3, None, "nullts"), R(3, Some(1), "real"))
    val got = collect(Upsert.latestPerKey(df(rows), Seq("k"), "ts"))
    assert(got == Set(
      (1L, Some(5L), "new"), (2L, Some(2L), "only"), (3L, Some(1L), "real")))
  }
}
