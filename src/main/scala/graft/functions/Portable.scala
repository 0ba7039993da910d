package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * The correctness gate hash-compares Spark results against DuckDB, so every
  * pseudo-random quantity (MinHash permutations, SimHash bits, LSH
  * hyperplanes) must be computable identically in both engines. MD5 is the
  * one hash both implement bit-identically, so all derived randomness comes
  * from `md5(seed || '_' || value)`:
  *
  *   hash60(s, seed) = int(first 15 hex digits of md5(seed_s)) ∈ [0, 2^60)
  *
  * 15 hex digits = 60 bits, safely inside a signed 64-bit long for both
  * engines. Spark side uses only codegen'd built-ins (md5/conv/substring),
  * no UDFs, so these stay inside whole-stage codegen at 100 TB scale.
  *
  * Floating-point note: all similarity math that feeds the oracle is done
  * on quantized integers (see [[VectorFns]]) — double accumulation order
  * differs across engines/parallelism, integer sums do not.
  */
object Portable {

  /** 60-bit MD5-derived hash of a string column under a seed. */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"${seed}_"), c)), 1, 15), 16, 10)
      .cast("long")

  /** DuckDB SQL fragment computing the same value as [[hash60]]. */
  def sqlHash60(expr: String, seed: Int): String =
    s"(('0x' || substr(md5('${seed}_' || $expr), 1, 15))::BIGINT)"

  /** k fixed 60-bit mixing constants (JVM MD5 of "mix_i" — same bytes any
    * engine would derive). XORing one base hash with k constants replaces k
    * independent MD5 evaluations in MinHash/SimHash: one MD5 per element
    * instead of k — the difference between 24M and 2M digests per million
    * shingles. XOR by a constant is a permutation of the hash space, which
    * is all min-wise hashing needs in practice. */
  def mixConstants(k: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k) { i =>
      val hex = md.digest(s"mix_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      BigInt(hex, 16).toLong
    }
  }
}
