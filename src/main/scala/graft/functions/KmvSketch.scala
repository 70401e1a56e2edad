package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch.
  *
  * Classic streaming sketch (Bar-Yossef et al., RANDOM'02): keep the k
  * smallest DISTINCT hash values of a set; if fewer than k exist the
  * count is exact, otherwise estimate |S| ≈ (k−1) · M / h_k where h_k
  * is the k-th smallest hash and M the hash modulus. O(k) state per
  * group, one pass, merge = union-and-trim — the 100 TB shape for
  * approximate COUNT(DISTINCT) (an exact distinct shuffles every
  * value; Spark's own approx_count_distinct is HLL++, whose estimate
  * no external oracle can reproduce).
  *
  * Built on the portable polynomial hash family ([[PolyHash]], base 31
  * mod 1e9+7), so the WHOLE sketch — k-th minimum included — is
  * deterministic and replicable arithmetically in DuckDB SQL
  * (`row_number() OVER (ORDER BY hash)` ≤ k), giving the approximate
  * operator a full value-level oracle.
  *
  * Implemented as a typed [[Aggregator]] (SURVEY §2.7: custom
  * aggregation state is Aggregator/TypedImperativeAggregate work): the
  * buffer is the sorted ascending array of ≤ k distinct hashes.
  */
object KmvSketch {

  /** (distinct-or-k count, k-th smallest hash or MaxValue) — the raw
    * sketch outputs the estimate derives from. */
  case class Kmv(n: Long, kth: Long)

  private def insert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val ins = -i - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // displaces the current maximum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  class KmvAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Kmv] {
    require(k >= 2, "KMV needs k >= 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], h: Long): Array[Long] =
      insert(b, h, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var out = a
      var i = 0
      while (i < b.length) { out = insert(out, b(i), k); i += 1 }
      out
    }
    override def finish(b: Array[Long]): Kmv =
      Kmv(b.length.toLong, if (b.length < k) Long.MaxValue else b(k - 1))
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Kmv] = Encoders.product[Kmv]
  }

  /** Uniformizing affine pass over a portable polynomial hash: the raw
    * hash of a SHORT string is far below the modulus (a 4-char string
    * folds to < 31⁴), which would wreck the (k−1)·M/h_k estimator —
    * KMV assumes hashes ~ uniform on [0, M). One multiply-add mod M
    * (the i=0 member of the affine family, [[graft.operators.Dedup
    * .affineA]]/[[graft.operators.Dedup.affineB]]) wraps the range
    * many times over and restores uniformity, exactly replicable in
    * the oracle. */
  def uniformize(h: Column): Column = {
    import org.apache.spark.sql.functions._
    pmod(h * 104729L + 12345L, lit(1000000007L))
  }

  /** Aggregate Column: the raw (n, kth) sketch of a LONG hash column
    * (hash with [[GraftFunctions.polyHash]] or `xxhash64` upstream,
    * then [[uniformize]] for the portable family). */
  def kmvAgg(hashCol: Column, k: Int): Column =
    udaf(new KmvAggregator(k), Encoders.scalaLong).apply(hashCol)

  /** Null-skipping input variant for sketching columns that contain
    * NULLs (profiling): with the primitive-Long encoder a NULL input
    * slot deserializes to a phantom 0 hash, silently inflating the
    * sketch by one value; the boxed-Long encoder lets reduce SEE the
    * null and drop it — COUNT(DISTINCT col) semantics, which ignore
    * NULL. */
  class KmvNullSafeAggregator(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Kmv] {
    private val inner = new KmvAggregator(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(b: Array[Long], h: java.lang.Long): Array[Long] =
      if (h == null) b else inner.reduce(b, h.longValue)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    override def finish(b: Array[Long]): Kmv = inner.finish(b)
    override def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Kmv] = inner.outputEncoder
  }

  /** Aggregate Column: [[kmvAgg]] that ignores NULL hash inputs. */
  def kmvAggNullSafe(hashCol: Column, k: Int): Column =
    udaf(new KmvNullSafeAggregator(k), Encoders.LONG).apply(hashCol)

  /** Variant that FINISHES with the sketch itself (the sorted ≤k min
    * hashes) instead of the (n, kth) summary — the mergeable form: a
    * downstream stage unions per-group sketches (explode → distinct →
    * k smallest) into the sketch of the union without touching the
    * data again. Mergeability is WHY sketches are the 100 TB shape:
    * partial sketches combine associatively across partitions, days,
    * and tiers. */
  class KmvSketchAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val inner = new KmvAggregator(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(b: Array[Long], h: Long): Array[Long] =
      inner.reduce(b, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate Column: the raw sorted min-hash array (see
    * [[KmvSketchAggregator]]). */
  def kmvSketchAgg(hashCol: Column, k: Int): Column =
    udaf(new KmvSketchAggregator(k), Encoders.scalaLong).apply(hashCol)

  /** Distinct-count estimate from the raw sketch struct:
    * exact below k, (k−1)·M/h_k at or above. Plain Column arithmetic so
    * the DuckDB oracle states the same formula. */
  def estimate(kmv: Column, k: Int, mod: Long): Column = {
    import org.apache.spark.sql.functions._
    when(kmv.getField("n") < k, kmv.getField("n").cast("double"))
      .otherwise(
        round(lit((k - 1).toDouble) * mod /
          kmv.getField("kth").cast("double"), 6))
  }
}
