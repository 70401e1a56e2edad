package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpecBase

/** The native PolyHash expression is value-identical to the built-in
  * HOF chain it replaced — on ASCII, non-ASCII (multi-byte, including
  * a supplementary-plane code point), empty, and null inputs — and
  * both its interpreted eval and its codegen path agree.
  */
class ExpressionsSpec extends SparkSpecBase {

  /** The original formulation (pre-optimization), kept as the spec. */
  private def polyHashHof(c: org.apache.spark.sql.Column) =
    aggregate(
      filter(split(c, ""), ch => length(ch) > 0),
      lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch), lit(1000000007L)))

  private val samples = Seq(
    "hello world", "the quick brown fox", "a", "", "  spaced  out  ",
    "é accents café", "日本語テキスト", "emoji 😀 tail",
    "mixed ascii é 的 😀 end", "0123456789", "!@#$%^&*()")

  test("PolyHash equals the split/ascii HOF fold on all input classes") {
    import spark.implicits._
    val df = (samples.map(Option(_)) :+ None).toDF("s")
    val cmp = df.select(
      col("s"),
      GraftFunctions.polyHash(col("s")).as("native"),
      polyHashHof(col("s")).as("hof"))
    val rows = cmp.collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch for ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2),
          s"hash mismatch for '${r.getString(0)}'")
    }
    assert(rows.count(_.isNullAt(1)) == 1)
  }

  /** The SRP HOF chain exactly as Similarity.srpSignature formulated it
    * before the native expression (portable plane family). */
  private def srpHof(emb: org.apache.spark.sql.Column, bits: Int) = {
    def w(p: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) = {
      val v = p.cast(org.apache.spark.sql.types.LongType) * 1009L +
        d.cast(org.apache.spark.sql.types.LongType) * 2003L + 12345L
      pmod(v * v, lit(4001L)) - 2000L
    }
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), p => {
        val proj = aggregate(
          zip_with(emb, sequence(lit(0), size(emb) - 1),
            (x, d) => x.cast(org.apache.spark.sql.types.DoubleType) *
              w(p, d).cast(org.apache.spark.sql.types.DoubleType)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0,
          call_function("shiftleft", lit(1L), p.cast(
            org.apache.spark.sql.types.IntegerType))).otherwise(lit(0L))
      }),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  test("SrpSignaturePortable equals the nested-HOF fold, incl. edge cases") {
    import spark.implicits._
    val vecs: Seq[Option[Seq[Option[Float]]]] = Seq(
      Some(Seq(Some(1.0f), Some(-2.5f), Some(0.25f), Some(7.125f))),
      Some(Seq(Some(-0.001f), Some(0.0f))),
      Some((1 to 64).map(i => Some((i * 0.37f - 12f)))),
      Some(Seq.empty),                       // empty embedding → sig 0
      Some(Seq(Some(1.0f), None, Some(3.0f))), // NULL element poisons
      None)                                  // NULL array → sig 0 (HOF)
    val df = vecs.toDF("e")
    val cmp = df.select(
      GraftFunctions.srpSignaturePortable(col("e"), 32).as("native"),
      srpHof(col("e"), 32).as("hof")).collect()
    cmp.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch at row $i")
      if (!r.isNullAt(0))
        assert(r.getLong(0) == r.getLong(1), s"sig mismatch at row $i")
    }
    // both formulations map the NULL array to 0, never NULL
    assert(cmp.count(_.isNullAt(0)) == 0)
  }

  test("DotProduct equals the zip_with/aggregate fold, incl. edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Array[Float], Array[Float])] =
      Seq.tabulate(50)(i =>
        (Array.fill(64)(rnd.nextFloat() * 2 - 1),
         Array.fill(64)(rnd.nextFloat() * 2 - 1))) ++ Seq(
        (Array.empty[Float], Array.empty[Float]),   // empty → 0.0
        (Array(1f, 2f), Array(3f)),                 // length mismatch → NULL
        (null, Array(1f, 2f)))                      // NULL array → NULL
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val cmp = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("native"), hof.as("old"))
      .collect()
    cmp.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"row $i nullability differs")
      if (!r.isNullAt(0))
        // bit-identical, not approximately equal: same IEEE fold order
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"row $i")
    }
    // null ELEMENT poisons: build via sql to get a null-containing array
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), NULL) AS a, " +
        "array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)) AS b")
    assert(withNullElem
      .select(GraftFunctions.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    // Literal folding runs the interpreted eval; a column over a
    // DataFrame runs whole-stage codegen — both must agree.
    import spark.implicits._
    samples.foreach { s =>
      val interp = PolyHash(
        org.apache.spark.sql.catalyst.expressions.Literal.create(s))
        .eval(null).asInstanceOf[Long]
      val codegen = Seq(s).toDF("s")
        .select(GraftFunctions.polyHash(col("s")).cast(LongType))
        .collect()(0).getLong(0)
      assert(interp == codegen, s"interp/codegen mismatch for '$s'")
    }
  }

  test("CdcBoundaries: sliding pass equals per-window rehash, both " +
      "eval paths, code-point positions") {
    import spark.implicits._
    // brute force: polyhash every w-code-point window independently
    def brute(s: String, w: Int, d: Int): Seq[Int] = {
      val cp = s.codePoints().toArray
      (w to cp.length).filter { i =>
        cp.slice(i - w, i)
          .foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L) %
          d == 0
      }
    }
    val rng = new scala.util.Random(42)
    // sample whole code points (a char index into a string with a
    // surrogate PAIR would yield lone surrogates, which UTF-8 cannot
    // represent — Spark would replace them and the fixture would test
    // the mangling, not the expression)
    val alphabet = Seq("a", "b", " ", "é", "x", "😀", "z", "?")
    val texts = samples ++ (1 to 30).map(_ =>
      (1 to rng.nextInt(300)).map(_ =>
        alphabet(rng.nextInt(alphabet.size))).mkString)
    for ((s, w, d) <- texts.flatMap(t => Seq((t, 8, 16), (t, 3, 4)))) {
      val expected = brute(s, w, d)
      val codegen = Seq(s).toDF("s")
        .select(GraftFunctions.cdcBoundaries(col("s"), w, d))
        .collect()(0).getSeq[Int](0)
      assert(codegen == expected, s"codegen w=$w d=$d for '$s'")
      val interp = CdcBoundaries(
        org.apache.spark.sql.catalyst.expressions.Literal.create(s), w, d)
        .eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      assert(interp == expected, s"interp w=$w d=$d for '$s'")
    }
  }
}
