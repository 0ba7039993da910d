package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-by-score typed Aggregator — per-group top-k WITHOUT a
  * window sort. The usual `row_number().over(partitionBy(group))` +
  * `filter(rk <= k)` formulation sorts EVERY group member through one
  * task; at 100 TB a popular group serializes terabytes. This
  * aggregator's partial buffer never exceeds k entries, so map-side
  * combine bounds the shuffle at (#groups × k) rows and merge is
  * O(k log k) regardless of group size.
  *
  * Unlike [[TopKAgg]] (a SpaceSaving *sketch*, order-dependent by
  * nature), this is EXACT and order-independent: the top-k of a union
  * is the top-k of the two tops, so reduce/merge order cannot change
  * the result. Ordering is (score DESC, id ASC) — deterministic under
  * score ties, which keeps queries over it hash-gateable when the
  * emitted columns are the ids/ranks rather than the float scores.
  */
class TopKByScore(k: Int)
    extends Aggregator[TopKByScore.ScoredId, Seq[TopKByScore.ScoredId],
      Seq[TopKByScore.ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  private val ord: Ordering[TopKByScore.ScoredId] =
    Ordering.by(e => (-e.score, e.id))

  private def trim(s: Seq[TopKByScore.ScoredId]): Seq[TopKByScore.ScoredId] =
    s.sorted(ord).take(k)

  override def zero: Seq[TopKByScore.ScoredId] = Seq.empty

  override def reduce(b: Seq[TopKByScore.ScoredId],
      a: TopKByScore.ScoredId): Seq[TopKByScore.ScoredId] =
    // k is small (a sample size); re-sorting k+1 entries per row beats
    // maintaining a heap through the encoder round-trips Spark inserts
    // between reduce calls
    trim(b :+ a)

  override def merge(x: Seq[TopKByScore.ScoredId],
      y: Seq[TopKByScore.ScoredId]): Seq[TopKByScore.ScoredId] =
    trim(x ++ y)

  override def finish(r: Seq[TopKByScore.ScoredId])
      : Seq[TopKByScore.ScoredId] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[TopKByScore.ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKByScore.ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKByScore {
  /** `payload` rides through untouched (e.g. the vector's true label
    * next to its id); ordering never looks at it. */
  case class ScoredId(score: Double, id: Long, payload: Long)
}

/** [[TopKByScore]] for string-keyed, integer-scored groups (t07's
  * per-language distinctive terms: key = token, score = the exact
  * tf·10⁶ DIV df surrogate). Same bound — partial buffers never exceed
  * k entries, shuffle bounded at (#groups × k) — same deterministic
  * (score DESC, id ASC) order; Long scores keep the result exact and
  * hash-gateable (no float merges). */
class TopKByScoreStr(k: Int)
    extends Aggregator[TopKByScoreStr.Scored, Seq[TopKByScoreStr.Scored],
      Seq[TopKByScoreStr.Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private val ord: Ordering[TopKByScoreStr.Scored] =
    Ordering.by(e => (-e.score, e.id))

  private def trim(s: Seq[TopKByScoreStr.Scored]): Seq[TopKByScoreStr.Scored] =
    s.sorted(ord).take(k)

  override def zero: Seq[TopKByScoreStr.Scored] = Seq.empty

  override def reduce(b: Seq[TopKByScoreStr.Scored],
      a: TopKByScoreStr.Scored): Seq[TopKByScoreStr.Scored] =
    trim(b :+ a)

  override def merge(x: Seq[TopKByScoreStr.Scored],
      y: Seq[TopKByScoreStr.Scored]): Seq[TopKByScoreStr.Scored] =
    trim(x ++ y)

  override def finish(r: Seq[TopKByScoreStr.Scored])
      : Seq[TopKByScoreStr.Scored] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[TopKByScoreStr.Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKByScoreStr.Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKByScoreStr {
  case class Scored(score: Long, id: String)
}
