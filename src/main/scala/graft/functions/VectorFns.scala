package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math on quantized integers.
  *
  * Why quantize: the correctness oracle hash-compares against DuckDB, and
  * double dot products depend on accumulation order (Spark's partial aggs
  * vs DuckDB's). `q(x) = round(x·10⁴)` makes every intermediate an exact
  * integer — sums are order-independent and the final
  * `dot / (√‖a‖·√‖b‖)` division happens on identical integers in both
  * engines, yielding bit-identical doubles. Quantization error at 1e-4 per
  * component is far below any ranking threshold we use.
  *
  * Everything is built-in higher-order functions (`zip_with`, `aggregate`)
  * — codegen'd, no UDFs, no shuffle for per-pair math. At 100 TB the
  * pattern is: broadcast the (small) query set, partition-parallel scan of
  * the candidate side, per-row arithmetic, then a top-k window — the only
  * shuffle is the final per-query top-k, which carries k rows per query.
  */
object VectorFns {

  /** Quantize a float/double array column to long(round(x·10⁴)). */
  def qvec(v: Column): Column =
    transform(v, x => round(x.cast("double") * 10000).cast("long"))

  /** Integer dot product — composable higher-order-function form. Kept as
    * the reference semantics; the hot paths use [[DotQ]], a fused codegen
    * expression with identical results (see FunctionsSpec equality test). */
  def dotqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Integer dot product via the native [[DotQ]] expression. Callers must
    * have run [[DotQ.register]] on the session (queries do). */
  def dotq(a: Column, b: Column): Column = DotQ.dotq(a, b)

  /** Squared norm (integer). */
  def norm2q(a: Column): Column = dotq(a, a)

  /** Cosine similarity from quantized ints — deterministic double. */
  /** Quantized-grid cosine. NULL when either norm is zero or absent —
    * a zero-norm (or null/empty) vector has no direction, and emitting
    * NULL makes every downstream threshold and rank drop it naturally
    * instead of dying on the ANSI divide-by-zero (EmbBoundarySpec: 17
    * similarity queries failed on one dirty vector before this guard).
    * The DuckDB oracles need no twin change: their float division
    * yields NaN, which fails the same predicates the NULL does. */
  def cosineQ(dot: Column, n2a: Column, n2b: Column): Column =
    when(n2a > 0 && n2b > 0,
      dot.cast("double") /
        (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double"))))

  /** DuckDB fragments mirroring the above (same names, same math). */
  def sqlQvec(expr: String): String =
    s"list_transform($expr, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
  def sqlDotq(a: String, b: String, dims: Int): String =
    s"list_sum(list_transform(range(1, ${dims + 1}), i -> ($a)[i] * ($b)[i]))::BIGINT"

  /** Random-hyperplane LSH planes, derived from MD5 so the DuckDB oracle
    * can regenerate the identical planes in SQL: component i of plane j is
    * +1 iff hash60("${2000+j}_i") is odd. Materialized here via JVM MD5
    * (same algorithm, same bytes). */
  def lshPlanes(nPlanes: Int, dims: Int): Array[Array[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dims) { (j, i) =>
      val hex = md.digest(s"${2000 + j}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      if (BigInt(hex, 16) % 2 == 1) 1 else -1
    }
  }

  /** LSH signature byte: bit j set iff dot(qv, plane_j) > 0. */
  def lshSignature(qv: Column, planes: Array[Array[Int]]): Column =
    planes.zipWithIndex.map { case (plane, j) =>
      val planeCol = array(plane.toIndexedSeq.map(lit(_)): _*)
      val d = aggregate(zip_with(qv, planeCol, (x, p) => x * p),
        lit(0L), (acc, v) => acc + v)
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB fragment for [[lshSignature]] over a quantized list column.
    * `off` selects a plane block: plane j of the fragment is global plane
    * `off + j` (seed 2000+off+j), matching `lshPlanes(...).slice(off, off+n)`
    * on the Spark side — the basis for multi-table LSH. */
  def sqlLshSignature(qv: String, nPlanes: Int, dims: Int, off: Int = 0): String =
    (0 until nPlanes).map { j =>
      val d = s"list_sum(list_transform(range(1, ${dims + 1}), " +
        s"i -> ($qv)[i] * (CASE WHEN ${Portable.sqlHash60(s"(i-1)::VARCHAR", 2000 + off + j)} % 2 = 1 THEN 1 ELSE -1 END)))"
      s"(CASE WHEN $d > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
