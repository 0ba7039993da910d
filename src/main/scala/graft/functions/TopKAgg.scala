package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch as a typed Aggregator — the
  * frequent-items summary Spark has no built-in aggregate for (HLL and
  * KLL quantiles exist as `approx_count_distinct`/`percentile_approx`;
  * `DataFrameStatFunctions.freqItems` is whole-DataFrame-only and gives
  * no counts). Bounded state: at most `capacity` (item → (count, err))
  * entries per group regardless of cardinality — the reason to sketch at
  * 100 TB, where an exact groupBy-count of a web-scale vocabulary is its
  * own shuffle.
  *
  * Algorithm (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams"): a seen item increments its counter;
  * an unseen item with the summary full evicts the minimum counter m and
  * enters with count = m.count + 1, err = m.count. Invariants carried by
  * every entry and preserved by [[merge]]:
  *
  *   count − err  ≤  true count  ≤  count
  *
  * and any item with true count > n/capacity is guaranteed present
  * (n = stream length). Merge (the map-side-combine requirement) treats
  * the other summary's entries as weighted arrivals: shared items add
  * counts and errors; new items evict the current minimum, inheriting
  * its count as added error — the standard mergeable-summaries
  * construction (Agarwal et al.), keeping both bounds valid.
  *
  * The OUTPUT (top items by estimate) depends on arrival/merge order, as
  * any SpaceSaving summary does — so queries over it take the rows-only
  * gate (like q22/q39's sketches) and the accuracy contract is asserted
  * in ScalaTest against exact counts instead.
  */
class TopKAgg(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, (Long, Long)],
      Seq[TopKAgg.Entry]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def evictMin(buf: mutable.HashMap[String, (Long, Long)])
      : (String, (Long, Long)) = {
    // deterministic tie-break on the key so equal-count evictions do not
    // depend on hash-map iteration order
    val m = buf.minBy { case (k, (c, _)) => (c, k) }
    buf -= m._1
    m
  }

  private def admit(buf: mutable.HashMap[String, (Long, Long)],
      item: String, addCount: Long, addErr: Long): Unit = {
    buf.get(item) match {
      case Some((c, e)) => buf(item) = (c + addCount, e + addErr)
      case None if buf.size < capacity =>
        buf(item) = (addCount, addErr)
      case None =>
        val (_, (mc, _)) = evictMin(buf)
        // the new item may have occurred up to mc times before: count is
        // an overestimate, err records how much of it is uncertain
        buf(item) = (mc + addCount, mc + addErr)
    }
  }

  override def reduce(buf: mutable.HashMap[String, (Long, Long)],
      item: String): mutable.HashMap[String, (Long, Long)] = {
    admit(buf, item, 1L, 0L)
    buf
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)])
      : mutable.HashMap[String, (Long, Long)] = {
    // feed b's entries largest-first so b's own heavy items are not
    // evicted by its light ones mid-merge
    b.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.foreach {
      case (item, (c, e)) => admit(a, item, c, e)
    }
    a
  }

  override def finish(buf: mutable.HashMap[String, (Long, Long)])
      : Seq[TopKAgg.Entry] =
    buf.toSeq
      .map { case (item, (c, e)) => TopKAgg.Entry(item, c, c - e) }
      .sortBy(en => (-en.est, en.item))

  override def bufferEncoder: Encoder[mutable.HashMap[String, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKAgg.Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** `est` is the overestimate (count), `lb` the guaranteed lower bound
    * (count − err): lb ≤ true count ≤ est. */
  case class Entry(item: String, est: Long, lb: Long)
}
