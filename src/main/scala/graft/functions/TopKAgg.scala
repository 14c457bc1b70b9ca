package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF: top-k (value, id) pairs per group via a bounded buffer —
  * the SCALABLE top-k-per-group. The window formulation
  * (`row_number().over(partitionBy(g).orderBy(v))`) must shuffle and SORT
  * every row of every group; this aggregator is a plain hash aggregate:
  * each partition keeps at most k entries per group (map-side partial
  * aggregation), the shuffle carries only k-sized buffers, and no sort of
  * the data ever happens — O(n log k) work, O(groups × k) shuffle bytes.
  * Use the window form when you need ranks attached to FULL rows; use
  * this when groups are huge and k is small (the 100 TB shape).
  *
  * Determinism: ties on value break to the SMALLER id, matching
  * `orderBy(v.desc, id.asc)`.
  */
class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // The O(1) rejection fast path in `reduce` calls b.last on a full buffer;
  // k <= 0 would make "full" mean "empty" and throw NoSuchElementException
  // deep inside codegen instead of at construction.
  require(k > 0, s"TopKAgg requires k > 0, got $k")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  // Invariant: the buffer is always sorted by `ord` (every path below
  // re-establishes it), so `b.last` is the worst kept entry. Once the
  // buffer is full, an input that does not beat the worst entry is
  // rejected in O(1) — the common case on large groups — keeping the
  // whole aggregation at the documented O(n log k), not O(n·k log k).
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.size < k) (b :+ a).sorted(ord)
    else if (ord.gteq(a, b.last)) b
    else (b.init :+ a).sorted(ord)

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
