package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum — the scale-safe replacement for the
  * `Window.partitionBy(part).orderBy(ord)` running-sum idiom.
  *
  * A plain ordered window funnels EVERY row of a partition key through a
  * single task's sort: fine when the key is high-cardinality, a
  * serialization point when it is not (a corpus with a handful of
  * sources at 100 TB pushes terabytes through one task). This operator
  * computes the identical result with the classic two-pass
  * scan/offset/scan decomposition used by GPU prefix sums and
  * external-sort runs:
  *
  *  1. range-bucket each row by its ORDER column — bucket
  *     `(ord - lo) DIV width` is monotone in `ord`, so bucket boundaries
  *     respect the global order (this is what makes the result
  *     bit-identical to the single-window formulation, unlike hash
  *     bucketing);
  *  2. aggregate per-(part, bucket) subtotals — a map-side-combinable
  *     shuffle reduced to `parts × buckets` rows;
  *  3. turn subtotals into exclusive per-bucket offsets with an ordered
  *     window over that TINY frame (bounded by the bucket-count config,
  *     not by the data — at most `buckets` rows per partition key);
  *  4. broadcast the offsets back and finish with a bucket-local ordered
  *     window: parallelism `parts × buckets` instead of `parts`.
  *
  * The whole decomposition stays IN the logical plan (declarative,
  * auditable, no driver round-trip), which means the input subtree
  * appears three times in the final plan (range probe, subtotals, final
  * pass). Two consequences for callers:
  *
  *  - evaluation: the input is computed three times — persist it first
  *    when it is expensive (the range probe only references (part, ord),
  *    so column pruning keeps that pass cheap on raw scans);
  *  - planning: on a DEEP-LINEAGE input, Catalyst analysis cost triples
  *    with the subtree — cut the lineage first (`localCheckpoint` /
  *    `checkpoint`), which is what the p01 pipeline does. On shallow
  *    scans (t12) the tripling is noise.
  *
  * Requirements: `ord` is integral (LongType) and unique within each
  * `part` group — the same precondition the ordered-window formulation
  * needs for a deterministic frame.
  *
  * Skewed ord distributions: buckets are fixed-width over [lo, hi], so
  * heavily CLUSTERED ord values (most rows in a narrow range plus far
  * outliers) land in few buckets — correctness is unaffected (the
  * decomposition is exact for any monotone bucketing; PrefixSumSpec
  * pins sparse/non-contiguous AND 90%-in-1%-of-range fixtures), but
  * final-pass parallelism degrades toward the plain window's. Raising
  * `buckets` restores it, and is CHEAP: the only cost that scales with
  * the bucket count is the offsets frame, parts × buckets rows of
  * ~24 bytes — 10⁵ buckets over 100 sources is still a ~240 MB
  * broadcast upper bound and usually far less (empty buckets emit no
  * subtotal row).
  *
  * Sizing rule for `spark.graft.pack.buckets`: a cluster of C rows
  * spanning width W inside a total ord range T receives ~buckets·W/T of
  * the buckets, so to cap a bucket at R rows set
  * {{{ buckets >= (T / W) * (C / R) }}}
  * — e.g. 90% of 10⁹ rows packed into 1% of the id range with a 10⁶
  * rows-per-task budget needs buckets ≥ 100 · 900 = 9·10⁴. When the
  * distribution is unknown, over-provisioning is the right default
  * (empty buckets are free); PrefixSumSpec measures exactly this
  * fixture. The alternative — quantile (equi-depth) boundaries — would
  * balance any distribution with far fewer buckets but needs a sampled
  * boundary pass: sampling is partition-layout-dependent, so the SAME
  * data could bucket differently across cluster configs. Results would
  * still be identical (any monotone bucketing is exact), but plans and
  * task metrics would not be reproducible run-to-run, and the
  * over-provisioned fixed-width grid achieves the same parallelism for
  * pennies — so this operator deliberately stays fixed-width.
  *
  * Reference packing rule this feeds (greedy token-budget binning):
  * dewi-alliance/helium-etl-lite has no training-data surface; this is
  * part of the LLM-pipeline extension (SURVEY §2, t12/p01).
  */
object PrefixSum {

  /** Number of range buckets per partition key. More buckets = more
    * parallelism in the final pass; the offsets frame stays
    * `parts × buckets` rows. Overridable for tests via
    * `spark.graft.pack.buckets`. */
  val DefaultBuckets = 32

  /** Adds column `out` = exclusive prefix sum of `value` over rows
    * ordered by `ord` within each `part` group. Bit-identical to
    * {{{ sum(value).over(Window.partitionBy(part).orderBy(ord)
    *     .rowsBetween(unboundedPreceding, -1)) }}}
    * but never funnels a whole partition key through one task. */
  def exclusive(df: DataFrame, part: String, ord: String, value: String,
                out: String, buckets: Int = DefaultBuckets): DataFrame =
    exclusiveMulti(df, part, ord, None, Seq(value -> out), buckets)

  /** [[exclusive]] with a tie-break column: rows are ordered by
    * `(ord, tie)` within each `part` group, so `ord` need not be unique —
    * only the PAIR must be. The range buckets still derive from `ord`
    * alone (bucketing is monotone in the leading sort key, which is all
    * the decomposition needs); `tie` only disambiguates order WITHIN a
    * bucket, and equal-`ord` rows always land in the same bucket, so the
    * result is bit-identical to the single-window
    * `orderBy(ord, tie)` formulation. The epoch-shuffle feed uses this
    * with `ord` = a 60-bit hash (collisions possible in principle) and
    * `tie` = the unique document id. */
  def exclusiveTied(df: DataFrame, part: String, ord: String, tie: String,
                    value: String, out: String,
                    buckets: Int = DefaultBuckets): DataFrame =
    exclusiveMulti(df, part, ord, Some(tie), Seq(value -> out), buckets)

  /** The general form: several exclusive prefix sums over the SAME order
    * in one pass — `pairs` maps each value column to its output column.
    * One bucketing, one subtotal shuffle, one final window evaluate all
    * the sums (the epoch feed needs both a position counter and a token
    * running total; computing them separately would double every pass). */
  def exclusiveMulti(df: DataFrame, part: String, ord: String,
                     tie: Option[String], pairs: Seq[(String, String)],
                     buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(pairs.nonEmpty, "need at least one (value -> out) pair")
    // pass 0: per-part ord range — #parts rows, broadcast back.
    // width = (hi-lo) DIV buckets + 1 guarantees bucket ids in
    // [0, buckets): for hi-lo = b*q + r (r < b), width = q+1 and
    // (hi-lo) DIV (q+1) <= b-1.
    val rng = df.groupBy(col(part))
      .agg(min(col(ord)).as("__lo"), max(col(ord)).as("__hi"))
      .withColumn("__w", expr(s"(__hi - __lo) DIV $buckets + 1"))
      .select(col(part), col("__lo"), col("__w"))
    val bucketed = df.join(broadcast(rng), Seq(part))
      .withColumn("__bkt", expr(s"($ord - __lo) DIV __w"))
      .drop("__lo", "__w")
    // pass 1: per-bucket subtotals (map-side combinable), then exclusive
    // offsets via a window over the parts × buckets frame — each window
    // partition holds at most `buckets` rows, a config-plane bound.
    val subAggs = pairs.map { case (v, o) => sum(col(v)).as(s"__sub_$o") }
    val subs = bucketed.groupBy(col(part), col("__bkt"))
      .agg(subAggs.head, subAggs.tail: _*)
    val wOff = Window.partitionBy(col(part)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pairs.foldLeft(subs) { case (acc, (_, o)) =>
      acc.withColumn(s"__off_$o",
        coalesce(sum(col(s"__sub_$o")).over(wOff), lit(0L)))
    }.select((col(part) +: col("__bkt") +:
      pairs.map { case (_, o) => col(s"__off_$o") }): _*)
    // pass 2: bucket-local running sum + broadcast offset. The ordered
    // window now partitions on (part, bucket) — parallelism scales with
    // the bucket count, not the number of distinct partition keys.
    val ordCols = col(ord) +: tie.map(col).toSeq
    val wLoc = Window.partitionBy(col(part), col("__bkt"))
      .orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    pairs.foldLeft(bucketed.join(broadcast(offsets), Seq(part, "__bkt"))) {
      case (acc, (v, o)) =>
        acc.withColumn(o,
          col(s"__off_$o") + coalesce(sum(col(v)).over(wLoc), lit(0L)))
    }.drop(("__bkt" +: pairs.map { case (_, o) => s"__off_$o" }): _*)
  }
}
