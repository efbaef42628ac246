package graft.operators

import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate over (key, count) pairs — the typed
  * `Aggregator` face of per-group top-k. The window form
  * (row_number over (partition by g order by n desc)) must SORT every
  * group in full before discarding all but k rows; this aggregate
  * carries a k-element buffer through Spark's ObjectHashAggregate, so
  * the partial state is O(k) per group ON THE MAP SIDE and merge is
  * associative — at 100 TB the shuffle ships |groups|·k rows instead
  * of the whole counted relation into a sort. Order: (n desc, key asc),
  * identical to the window form's — the two plans are interchangeable
  * and parity is spec-pinned.
  *
  * The buffer stays a small sorted Vector (k ≤ ~100): insertion is
  * O(k), which beats heap constant factors at these sizes and keeps
  * the Encoder a plain product type. */
class TopKAgg(k: Int)
  extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
  import org.apache.spark.sql.Encoder
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  private def lt(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  override def zero: Seq[(String, Long)] = Vector.empty
  // The buffer is ALWAYS sorted by lt (zero trivially; reduce/merge
  // preserve it), so reduce is early-reject + ordered insert — true
  // O(k) per row, no per-row re-sort: a full buffer whose k-th element
  // beats the newcomer drops it in O(1) (the overwhelmingly common
  // case on a heavy-hitter stream), otherwise one linear scan finds
  // the insertion point.
  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] = {
    if (buf.size >= k && lt(buf(k - 1), in)) buf
    else {
      val i = buf.indexWhere(e => lt(in, e)) match {
        case -1 => buf.size
        case x  => x
      }
      ((buf.take(i) :+ in) ++ buf.drop(i)).take(k)
    }
  }
  // Two sorted runs → one linear sorted-merge, capped at k.
  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] = {
    val out = Vector.newBuilder[(String, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && !lt(b(j), a(i)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }
  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
