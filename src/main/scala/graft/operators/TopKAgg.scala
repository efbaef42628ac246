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
  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    ((buf :+ in).sortWith(lt)).take(k)
  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    ((a ++ b).sortWith(lt)).take(k)
  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
