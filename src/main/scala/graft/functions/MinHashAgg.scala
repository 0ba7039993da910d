package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator merging MinHash signatures (SURVEY §2.9's reserved
  * custom-Aggregator slot): the signature of a UNION of shingle sets is
  * the elementwise minimum of the sets' signatures — an associative,
  * commutative merge, so Spark runs it with map-side partial aggregation
  * and a k-longs shuffle per group, never moving shingle sets.
  *
  * Use cases: signature of a document group (near-dup cluster → cluster
  * signature), incremental signatures in streaming state (see
  * [[graft.streaming.IncrementalDedup]]), signature of a source/partition
  * for cheap cross-partition similarity screening.
  */
class MinHashAgg(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard between two signatures: fraction of agreeing
    * components (the MinHash estimator), in per-mille. */
  def estimateJaccardPm(a: Seq[Long], b: Seq[Long]): Long = {
    val k = math.min(a.length, b.length)
    if (k == 0) return 0L
    var agree = 0
    var i = 0
    while (i < k) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree * 1000L / k
  }
}
