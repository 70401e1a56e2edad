package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Grouped top-k as a BOUNDED-HEAP aggregation — the scale-correct
  * alternative to `row_number().over(Window.partitionBy(key)) <= k`.
  *
  * The window formulation shuffles and SORTS every row of every key to
  * rank them, then discards all but k — at 100 TB that is a full
  * corpus sort to keep a sliver. This aggregator keeps at most k
  * (score, id) entries per group per map task, partial-combines them
  * (merge = merge-and-trim, associative), and ships ≤ k entries per
  * (key, partition) through the shuffle — the same contract as
  * Spark's own global `TakeOrderedAndProject`, applied per key.
  *
  * Ordering: score DESC, id ASC (the deterministic tiebreak every
  * gated query here uses). Output is the sorted array of (score, id)
  * structs; explode + posexplode downstream for row form.
  */
object TopK {

  /** One ranked entry: score descending, id ascending on ties. */
  case class Entry(score: Double, id: Long)

  private def lt(a: Entry, b: Entry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Insert preserving sorted order, trimming past k. Buffers are tiny
    * (≤ k), so O(k) insertion beats heap bookkeeping in practice. */
  private def insert(buf: Array[Entry], e: Entry, k: Int): Array[Entry] = {
    var i = 0
    while (i < buf.length && lt(buf(i), e)) i += 1
    if (i >= k) return buf
    val n = math.min(buf.length + 1, k)
    val out = new Array[Entry](n)
    System.arraycopy(buf, 0, out, 0, i)
    out(i) = e
    System.arraycopy(buf, i, out, i + 1, n - i - 1)
    out
  }

  class TopKAggregator(k: Int)
      extends Aggregator[Entry, Array[Entry], Array[Entry]] {
    require(k >= 1, "top-k needs k >= 1")
    override def zero: Array[Entry] = Array.empty[Entry]
    override def reduce(b: Array[Entry], e: Entry): Array[Entry] =
      insert(b, e, k)
    override def merge(a: Array[Entry], b: Array[Entry]): Array[Entry] = {
      var out = a
      var i = 0
      while (i < b.length) { out = insert(out, b(i), k); i += 1 }
      out
    }
    override def finish(b: Array[Entry]): Array[Entry] = b
    override def bufferEncoder: Encoder[Array[Entry]] =
      ExpressionEncoder[Array[Entry]]()
    override def outputEncoder: Encoder[Array[Entry]] =
      ExpressionEncoder[Array[Entry]]()
  }

  /** Aggregate Column: sorted array of the group's top-k
    * (score DESC, id ASC) entries. */
  def topKAgg(score: Column, id: Column, k: Int): Column =
    udaf(new TopKAggregator(k), Encoders.product[Entry])
      .apply(score, id)
}
