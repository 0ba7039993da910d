package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Portable._

/** Text-pipeline column functions: tokenization, shingling, MinHash,
  * SimHash, fingerprints, quality stats. All pure Column expressions
  * (higher-order functions, no UDFs) — per-row, shuffle-free, codegen'd;
  * the only shuffles in the dedup queries are the final group-bys/joins on
  * hashed keys, which is the minimum any distributed dedup needs.
  */
object TextFns {

  /** Whitespace tokens, empties dropped (documents carry trailing spaces). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Word k-shingles as strings ("w1 w2 w3"), distinct (set semantics for
    * Jaccard). Empty array when the doc has fewer than k tokens. */
  def shingles(text: Column, k: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      filter(
        transform(ts, (_, i) => concat_ws(" ", slice(ts, i + 1, lit(k)))),
        (s, i) => i <= size(ts) - k))
  }

  /** MinHash signature: for each of `k` seeded hash functions, the minimum
    * [[Portable.hash60]] over the shingle set. Computed entirely per-row —
    * no explode, no shuffle (the naive explode+groupBy(min) formulation
    * shuffles |docs|·|shingles|·k rows; this shuffles nothing). */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    array((0 until k).map(seed =>
      array_min(transform(shingleSet, sh => hash60(sh, seed)))): _*)

  /** LSH band key: hash of one band's slice of the signature. Banding with
    * b bands of r rows catches pairs with Jaccard ≳ (1/b)^(1/r). */
  def bandKey(sig: Column, band: Int, rowsPerBand: Int): Column =
    md5(concat_ws(",", lit(band.toString),
      transform(slice(sig, band * rowsPerBand + 1, rowsPerBand),
        x => x.cast("string"))))

  /** SimHash over tokens, `bits` wide (≤ 32): bit j is set iff the number
    * of tokens whose hash60(token, j-th-seed) is odd exceeds half the token
    * count — a portable majority-of-signs formulation. */
  def simhash(tokenArr: Column, bits: Int): Column = {
    val n = size(tokenArr)
    val terms = (0 until bits).map { j =>
      val ones = size(filter(tokenArr, t => hash60(t, 1000 + j) % 2 === 1))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Normalized-text fingerprint: lowercase, strip non [a-z ], collapse
    * runs of spaces, trim, md5. Catches case/punctuation near-dups. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z ]", ""),
      " +", " ")))

  /** Integer quality stats (portable: no double ratios — scaled integer
    * arithmetic only). */
  def wordCount(text: Column): Column = size(tokens(text))
  def charCount(text: Column): Column = length(text)
  /** Tokens matching a BPE-ish word regex (letters only, len>=2). */
  def alphaTokenCount(text: Column): Column =
    size(filter(tokens(text), t => t.rlike("^[a-zA-Z]{2,}$")))
  /** Stopword hits (tiny English list — the heuristic the reference-free
    * lang-ID below shares). */
  val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(_.toString): _*)))

  /** Heuristic language ID: score = 1000·stopwordHits / tokens; 'en' iff
    * score ≥ threshold (per-mille, integer math). */
  def langId(text: Column, threshPerMille: Int = 60): Column =
    when(wordCount(text) > 0 &&
      stopwordCount(text) * 1000 >= wordCount(text) * threshPerMille, "en")
      .otherwise("other")
}
