package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Single-pass native sketch expressions over a pre-hashed `array<long>`
  * column — the custom-`Expression` tier of the builder contract, used
  * where the composable HOF forms have the right SEMANTICS but the wrong
  * CONSTANT FACTOR:
  *
  *  - the HOF SimHash ([[TextFns.simhashFromHashes]]) runs `bits` separate
  *    `size(filter(...))` passes — 48 interpreted array traversals per row
  *    for the 48-bit hamming variant (d07);
  *  - the HOF MinHash ([[TextFns.minhashFromHashes]]) runs `k` separate
  *    `array_min(transform(...))` passes.
  *
  * These expressions traverse the array ONCE, updating all counters/minima
  * per element, with whole-stage codegen. Output values are bit-identical
  * to the HOF forms (asserted in FunctionsSpec), so the DuckDB oracles are
  * untouched. The HOF forms stay in [[TextFns]] as the executable spec.
  */
object HashSketch {

  /** Register all native sketch functions in the session registry
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    // delegates to the shared definition list (FunctionDefs) so the
    // lazy in-session path and the spark.sql.extensions injector cannot
    // drift; the bloom sizing/constant-sketch contract is documented on
    // the FunctionDefs entries
    FunctionDefs.registerAll(spark)

  /** mod > 0 reduces each hash mod `mod`; mod = 0 keeps the full 60 bits
    * (the [[TextFns.hash60Array]]-over-tokens shape d04/d07 use). */
  def tokenHashSeq(text: Column, seed: Int, mod: Long): Column =
    call_function("token_hash_seq", text, lit(seed), lit(mod))

  def simhashBits(arr: Column, bits: Int): Column =
    call_function("simhash_bits", arr, lit(bits))

  def minhashSig(arr: Column, k: Int): Column =
    call_function("minhash_sig", arr, lit(k))

  def shingleSeq(th: Column, k: Int): Column =
    call_function("shingle_seq", th, lit(k))

  def winnowSet(seq: Column, w: Int): Column =
    call_function("winnow_set", seq, lit(w))

  def lshSig(qv: Column, nPlanes: Int, off: Int): Column =
    call_function("lsh_sig", qv, lit(nPlanes), lit(off))

  private[functions] def constInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $e")
  }

  private[functions] def constLong(e: Expression, name: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case _ => throw new IllegalArgumentException(
      s"$name must be a long literal, got $e")
  }

  private[functions] def checkArr(t: DataType, fn: String): TypeCheckResult =
    t match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<bigint>, got $other")
    }
}

/** Random-hyperplane LSH signature, fused: bit j of the output is set iff
  * dot(qv, plane_{off+j}) > 0, all `nPlanes` dots accumulated in ONE pass
  * over the vector. The HOF form ([[VectorFns.lshSignature]]) materializes
  * one zip_with product array per plane — nPlanes array allocations and
  * traversals per row. Plane signs are the MD5-derived ±1 matrix of
  * [[VectorFns.lshPlanes]] (global plane index = off + j, seed 2000+off+j),
  * precomputed here to [[LshSig.MaxDims]] components; bit-identity with
  * the HOF form (for equal vector/plane lengths) is asserted in
  * FunctionsSpec. `second`/`third` must be integer literals. */
case class LshSig(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  private val nPlanes = HashSketch.constInt(second, "lsh_sig(nPlanes)")
  private val off = HashSketch.constInt(third, "lsh_sig(off)")
  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1,63], got $nPlanes")
  require(off >= 0, s"off must be >= 0, got $off")
  // memoized: Catalyst copies expressions dozens of times during
  // analysis/optimization, and withNewChildrenInternal -> copy() re-runs
  // initializers — recomputing 8k MD5 digests per copy cost ~1s/query
  // before the cache
  private val signs: Array[Array[Int]] = LshSig.signsFor(nPlanes, off)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    HashSketch.checkArr(first.dataType, "lsh_sig")

  override def nullSafeEval(input: Any, p2: Any, p3: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), LshSig.MaxDims)
    var r = 0L
    var j = 0
    while (j < nPlanes) {
      val row = signs(j)
      var s = 0L
      var i = 0
      while (i < n) { s += a.getLong(i) * row(i); i += 1 }
      if (s > 0) r |= (1L << j)
      j += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "int[][]")
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${LshSig.MaxDims});
         |long $r = 0L;
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  int[] $row = $signsRef[$j];
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getLong($i) * $row[$i];
         |  }
         |  if ($s > 0) $r |= (1L << $j);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "lsh_sig"
}

object LshSig {
  /** Precomputed plane width; vectors longer than this are truncated (the
    * engine's embeddings are 64-dim — see SimilarityOps.DIMS). */
  val MaxDims = 512

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Int]]]()

  private[functions] def signsFor(nPlanes: Int, off: Int): Array[Array[Int]] =
    cache.computeIfAbsent((nPlanes, off), _ =>
      VectorFns.lshPlanes(off + nPlanes, MaxDims).slice(off, off + nPlanes))
}

/** SimHash: output bit j set iff bit j is 1 in the strict majority of the
  * input hashes. Matches `TextFns.simhashFromHashes` exactly (empty array
  * → 0, null array → null). `right` must be an integer literal. */
case class SimHashBits(left: Expression, right: Expression)
    extends BinaryExpression {
  private val bits = HashSketch.constInt(right, "simhash_bits(bits)")
  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    HashSketch.checkArr(left.dataType, "simhash_bits")

  override def nullSafeEval(input: Any, bitsIgnored: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var j = 0
      while (j < bits) { cnt(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < bits) { if (2 * cnt(j) > n) r |= (1L << j); j += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $cnt[$j] += (int) (($h >>> $j) & 1L);
         |  }
         |}
         |long $r = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if (2 * $cnt[$j] > $n) $r |= (1L << $j);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "simhash_bits"
}

/** MinHash signature: k minima of `h XOR C_i` over the input hashes, one
  * array pass. Matches `TextFns.minhashFromHashes` exactly, including the
  * degenerate empty-array case (k nulls — `array_min` of empty is null).
  * `right` must be an integer literal. */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {
  private val k = HashSketch.constInt(right, "minhash_sig(k)")
  require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
  private val cs: Array[Long] = Portable.mixConstants(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    HashSketch.checkArr(left.dataType, "minhash_sig")

  override def nullSafeEval(input: Any, kIgnored: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var j = 0
      while (j < k) {
        val v = h ^ cs(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("minhashConsts", cs, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = $h ^ $csRef[$j];
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  Object[] $out = new Object[$k];
         |  for (int $j = 0; $j < $k; $j++) $out[$j] = (Long) $mins[$j];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "minhash_sig"
}

/** Shingle-hash sequence: out(i) = (Σ_j th(i+j)·C_j) mod 2^40 for the k
  * token hashes starting at i — one pass, no intermediate slice arrays.
  * Matches `TextFns.shingleSeqFromHashes` exactly (fewer than k tokens →
  * empty array). `right` must be an integer literal. */
case class ShingleSeq(left: Expression, right: Expression)
    extends BinaryExpression {
  private val k = HashSketch.constInt(right, "shingle_seq(k)")
  require(k >= 1 && k <= TextFns.ShingleCoef.length,
    s"k must be in [1,${TextFns.ShingleCoef.length}], got $k")
  private val coef: Array[Long] = TextFns.ShingleCoef.take(k)
  private val mod: Long = TextFns.ShingleMod

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    HashSketch.checkArr(left.dataType, "shingle_seq")

  override def nullSafeEval(input: Any, kIgnored: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val len = n - (k - 1)
    if (len <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      var s = 0L
      var j = 0
      while (j < k) { s += a.getLong(i + j) * coef(j); j += 1 }
      out(i) = java.lang.Math.floorMod(s, mod)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coefRef = ctx.addReferenceObj("shingleCoefs", coef, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int $len = $n - ${k - 1};
         |if ($len <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$len];
         |  for (int $i = 0; $i < $len; $i++) {
         |    long $s = 0L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      $s += $a.getLong($i + $j) * $coefRef[$j];
         |    }
         |    $out[$i] = (Long) Math.floorMod($s, ${mod}L);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "shingle_seq"
}

/** Winnowing fingerprint set: distinct minima of every sliding window of
  * `w` over the hash sequence, first-occurrence order — one pass with a
  * naive w-wide window min (w is small). Matches `TextFns.winnowing`
  * exactly (fewer than w hashes → empty array). `right` must be an
  * integer literal. */
case class WinnowSet(left: Expression, right: Expression)
    extends BinaryExpression {
  private val w = HashSketch.constInt(right, "winnow_set(w)")
  require(w >= 1 && w <= 64, s"w must be in [1,64], got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    HashSketch.checkArr(left.dataType, "winnow_set")

  override def nullSafeEval(input: Any, wIgnored: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val len = n - (w - 1)
    if (len <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < len) {
      var m = Long.MaxValue
      var j = 0
      while (j < w) {
        val v = a.getLong(i + j)
        if (v < m) m = v
        j += 1
      }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val it = ctx.freshName("it")
      s"""
         |int $n = $a.numElements();
         |int $len = $n - ${w - 1};
         |if ($len <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  java.util.LinkedHashSet<Long> $seen = new java.util.LinkedHashSet<Long>();
         |  for (int $i = 0; $i < $len; $i++) {
         |    long $m = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $w; $j++) {
         |      long $v = $a.getLong($i + $j);
         |      if ($v < $m) $m = $v;
         |    }
         |    $seen.add((Long) $m);
         |  }
         |  Object[] $out = new Object[$seen.size()];
         |  int $idx = 0;
         |  java.util.Iterator<Long> $it = $seen.iterator();
         |  while ($it.hasNext()) { $out[$idx++] = $it.next(); }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "winnow_set"
}

/** Per-token 40-bit hash sequence, fused end-to-end: tokenize the UTF-8
  * bytes (maximal runs of non-space bytes ≡ split-on-' ' with empties
  * dropped), MD5 each token under the `"<seed>_"` prefix, take the first
  * 60 digest bits — by construction the value `conv(substr(md5_hex,1,15),
  * 16,10)` parses, i.e. exactly [[Portable.hash60]] — and reduce mod 2^40
  * ([[TextFns.ShingleMod]]).
  *
  * The HOF form ([[TextFns.tokenHashSeqHof]], kept as the executable
  * spec) allocates per token: a token UTF8String, a seed concat, a
  * 32-char hex string, a substring, and conv's parse buffer — all
  * interpreted inside the lambda. This expression allocates nothing per
  * token beyond the digest's own buffer (one thread-local MessageDigest
  * per executor thread), and the whole pass stays inside whole-stage
  * codegen via a static call. Bit-identity with the HOF form is
  * property-asserted in FunctionsSpec, so the DuckDB oracles (which
  * compute the same 15-hex-digit value independently) are untouched. */
case class TokenHashSeq(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  private val seed = HashSketch.constInt(second, "token_hash_seq(seed)")
  private val mod = HashSketch.constLong(third, "token_hash_seq(mod)")
  private val prefix: Array[Byte] = s"${seed}_".getBytes("UTF-8")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    first.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_hash_seq expects string, got $other")
    }

  override def nullSafeEval(input: Any, p2: Any, p3: Any): Any =
    TokenHashSeq.eval(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      prefix, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("thsPrefix", prefix, "byte[]")
    // MODULE$ access: the case class inherits eval(...) from Expression,
    // which suppresses the companion's static forwarder — Janino must
    // call the module instance directly
    nullSafeCodeGen(ctx, ev, (in, _, _) =>
      s"${ev.value} = graft.functions.TokenHashSeq$$.MODULE$$.eval($in, $pRef, ${mod}L);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "token_hash_seq"
}

object TokenHashSeq {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
  // one reusable digest output buffer per executor thread — md.digest()
  // would otherwise allocate a fresh 16-byte array per token
  private val digLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))

  /** Static entry shared by interpreted eval and generated code;
    * mod <= 0 keeps the full 60-bit value. Accumulates into a primitive
    * long[] (no boxing) and returns UnsafeArrayData over it. */
  def eval(s: org.apache.spark.unsafe.types.UTF8String,
      prefix: Array[Byte], mod: Long): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = mdLocal.get()
    val dig = digLocal.get()
    var out = new Array[Long](16)
    var cnt = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      val start = i
      while (i < n && bytes(i) != ' ') i += 1
      if (i > start) {
        md.reset()
        md.update(prefix)
        md.update(bytes, start, i - start)
        md.digest(dig, 0, 16)
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
        val h = v >>> 4
        if (cnt == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        out(cnt) = if (mod > 0) h % mod else h
        cnt += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(
        if (cnt == out.length) out else java.util.Arrays.copyOf(out, cnt))
  }
}
