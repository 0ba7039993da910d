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

  /** Numeric k-shingles: hash each token once (MD5-derived, mod 2^40),
    * then combine k consecutive token hashes with a small-coefficient
    * polynomial mod 2^40 — no shingle strings are ever built and MD5 runs
    * per token, not per (shingle × hash-function). Coefficients stay below
    * 2^20 so every product fits in 60 bits (ANSI-safe in both engines).
    * Collision probability at 2^40 over millions of shingles is
    * negligible; set semantics (distinct) are preserved.
    */
  val ShingleMod: Long = 1L << 40
  val ShingleCoef: Array[Long] = Array(1L, 524287L, 914219L) // < 2^20

  /** Per-token 40-bit hashes, ordered. MATERIALIZE THIS AS ITS OWN COLUMN
    * (`withColumn`) before deriving shingles/winnowing from it: the
    * derivations reference their input several times per element, and if
    * the input is this raw expression rather than a column attribute,
    * every reference re-evaluates the whole MD5 pass — O(n²·md5) per row
    * instead of O(n·k) integer ops.
    *
    * Delegates to the fused native [[HashSketch.tokenHashSeq]] expression
    * (requires `HashSketch.register` on the session — every dedup query
    * and streaming op does this); [[tokenHashSeqHof]] below is the
    * composable executable spec it is property-tested against. */
  def tokenHashSeq(text: Column): Column =
    HashSketch.tokenHashSeq(text, 0, ShingleMod)

  /** The HOF form of [[tokenHashSeq]] — kept as the executable spec
    * (FunctionsSpec asserts bit-identity with the native expression). */
  def tokenHashSeqHof(text: Column): Column =
    transform(tokens(text), t => pmod(hash60(t, 0), lit(ShingleMod)))

  /** Ordered shingle-hash sequence from a token-hash array: k shifted
    * slices combined with the coefficient polynomial, mod 2^40. O(n·k)
    * per row, array inputs only as HOF arguments (see safety rule). */
  def shingleSeqFromHashes(th: Column, k: Int): Column = {
    require(k <= ShingleCoef.length, s"k=$k needs more coefficients")
    val n = size(th)
    val len = n - (k - 1)
    val scaled = (0 until k).map(j =>
      transform(slice(th, lit(j + 1), len), x => x * lit(ShingleCoef(j))))
    val summed = scaled.reduce((a, b) => zip_with(a, b, (x, y) => x + y))
    val sq = transform(summed, x => pmod(x, lit(ShingleMod)))
    when(n >= k, sq).otherwise(emptyLongArray)
  }

  /** Distinct shingle-hash set from a materialized [[tokenHashSeq]]. */
  def shingleSetFromHashes(th: Column, k: Int): Column =
    array_distinct(shingleSeqFromHashes(th, k))

  /** Base 60-bit hashes of a string array — materialize this as its own
    * column (one MD5 per element) before deriving MinHash/SimHash from it;
    * the derivations below are pure integer ops over the hashed array. */
  def hash60Array(arr: Column, seed: Int): Column =
    transform(arr, x => hash60(x, seed))

  /** MinHash signature from pre-hashed elements: the i-th hash function is
    * `h XOR C_i` ([[Portable.mixConstants]]), so the k minima need k cheap
    * integer passes, not k MD5 passes. Computed entirely per-row — no
    * explode, no shuffle (the naive explode+groupBy(min) formulation
    * shuffles |docs|·|shingles|·k rows; this shuffles nothing). */
  def minhashFromHashes(hashedArr: Column, k: Int): Column = {
    val cs = Portable.mixConstants(k)
    array((0 until k).map(i =>
      array_min(transform(hashedArr, h => h.bitwiseXOR(lit(cs(i)))))): _*)
  }

  /** LSH band key: hash of one band's slice of the signature. Banding with
    * b bands of r rows catches pairs with Jaccard ≳ (1/b)^(1/r). */
  def bandKey(sig: Column, band: Int, rowsPerBand: Int): Column =
    md5(concat_ws(",", lit(band.toString),
      transform(slice(sig, band * rowsPerBand + 1, rowsPerBand),
        x => x.cast("string"))))

  /** SimHash from pre-hashed tokens, `bits` wide (≤ 32): output bit j is
    * set iff the j-th bit is 1 in the majority of token hashes — a portable
    * majority-of-signs formulation, all integer ops over one hashed array
    * (one MD5 per token total, not per bit). */
  def simhashFromHashes(hashedArr: Column, bits: Int): Column = {
    val n = size(hashedArr)
    val terms = (0 until bits).map { j =>
      val ones = size(filter(hashedArr,
        h => shiftright(h, j).bitwiseAND(lit(1L)) === 1))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Evaluation-safety rule for everything below: per-element work must
    * reference ONLY lambda variables; whole-array inputs appear ONLY as
    * higher-order-function *arguments* (evaluated once per row). An array
    * referenced *inside* a lambda (element_at/slice/size on the outer
    * expression) is re-evaluated per element, and once CollapseProject
    * inlines the upstream chain that turns an O(n) pass into O(n²)–O(n³)
    * interpreted evaluation per row. Hence the shifted-slice `zip_with`
    * chains: k shifted views, combined pairwise. */
  private def emptyLongArray: Column =
    array().cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType))

  /** Winnowing fingerprints (the MOSS rolling-hash scheme): over the
    * *sequence* of shingle hashes (order preserved, not the distinct set),
    * take the minimum of every sliding window of `w`, then distinct. Two
    * documents sharing a long run of text share the run's winnowed minima
    * regardless of alignment — the guarantee plain shingle sampling lacks.
    * Sliding minima via w shifted slices folded with `least`. */
  def winnowing(hashedSeq: Column, w: Int): Column = {
    val n = size(hashedSeq)
    val len = n - (w - 1)
    val shifted = (0 until w).map(j => slice(hashedSeq, lit(j + 1), len))
    val mins = shifted.reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    when(n >= w, array_distinct(mins)).otherwise(emptyLongArray)
  }

  /** Normalized-text fingerprint: lowercase, strip non [a-z ], collapse
    * runs of spaces, trim, md5. Catches case/punctuation near-dups. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z ]", ""),
      " +", " ")))

  /** The surviving lines of a document under the boilerplate rules —
    * drop lines with fewer than 3 words or matching the stop-phrase
    * pattern (nav/footer shapes). ONE definition feeding the t29 audit
    * query and ingest-time cleaning (`Nightly --clean-lines`), so the
    * report and the applied scrub cannot drift. Pure per-row array
    * ops; the SQL twin lives beside t29's oracle. */
  def keptLines(text: Column): Column =
    filter(split(text, "\n"), l =>
      size(split(l, " ")) >= 3 &&
        !l.rlike("(click here|cookie policy|subscribe)"))

  /** [[keptLines]] reassembled — the cleaned document text. */
  def cleanLines(text: Column): Column =
    array_join(keptLines(text), "\n")

  /** Occurrences of the most frequent element of a long array (the mode's
    * COUNT, not its value) as a zero-shuffle per-row fold: sort, then max
    * equal-run length. Replaces the explode→count→max→join-back plan for
    * per-row mode statistics (t10). Returns 0 for an empty array. The
    * lambda references only its own variables (evaluation-safety rule).
    * The 'prev' sentinel -1 pairs with run=0, so even an input that
    * contains -1 counts correctly: a leading -1 matches the sentinel and
    * advances run to 0+1 = 1, exactly its true count so far. */
  def modeCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit(-1L).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

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
