package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Shared deterministic mixing (splitmix64 finalizer, public-domain
  * constants). */
private[graft] object HashMix {
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** xxhash64 of a UTF8String with Spark's default seed (42) — matches
    * the built-in `xxhash64` function. */
  @inline def hashString(s: UTF8String, seed: Long = 42L): Long =
    XXH64.hashUTF8String(s, seed)

  /** Indexed mix stream: mixAt(seed, i) — the shared constant source
    * for MinHash coefficients (HOF and expression forms must agree). */
  @inline def mixAt(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Codegen bridge for the imperative hash kernels: `doGenCode` emits a
  * call to the expression's typed `compute` method through a reference
  * object, so the operator PARTICIPATES in whole-stage codegen (no
  * CodegenFallback — fusion with surrounding projections/filters is
  * preserved) while the tight loops stay in compiled Scala. This is the
  * same shape Spark's own StaticInvoke-backed expressions use: the JIT
  * sees one monomorphic call site per kernel. */
private[functions] trait HashKernelCodegen extends UnaryExpression {
  /** Java source type of `compute`'s return value. */
  private def javaResultType: String = dataType match {
    case LongType => "long"
    case _ => classOf[ArrayData].getName
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ($javaResultType) $ref.compute($c);")
  }
}

/** MinHash signature of an array<string> shingle set, as ONE imperative
  * pass per row.
  *
  * The pure-SQL formulation (64 `transform`+`array_min` HOF calls) is
  * semantically identical but pays interpreted-lambda dispatch and 64
  * intermediate arrays per row — higher-order functions are not
  * codegen'd in Spark. This expression hashes each shingle once and
  * folds all k minima in a tight loop: the per-row cost is
  * O(shingles·k) long ops with zero allocation beyond the result.
  * Same math as Dedup.minhashSignatureHof (32-bit folded base hash,
  * 30-bit odd multipliers — ANSI-safe, no Long overflow).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with HashKernelCodegen {

  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  // precomputed affine coefficients (identical to the HOF formulation)
  private lazy val as: Array[Long] = Array.tabulate(numHashes)(i =>
    (HashMix.mixAt(seed, 2L * i) & 0x3FFFFFFFL) | 1L)
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(i =>
    HashMix.mixAt(seed, 2L * i + 1) & 0x7FFFFFFFL)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = HashMix.hashString(arr.getUTF8String(i)) & 0xFFFFFFFFL
      var j = 0
      while (j < numHashes) {
        val p = as(j) * h + bs(j)
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of an array<string> token list — one imperative pass:
  * hash each token (xxhash64, seed 42 — same as the built-in), ±1 each
  * of 64 bit counters, sign → bit. */
case class SimHash64(child: Expression)
    extends UnaryExpression with HashKernelCodegen {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = HashMix.hashString(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counters(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH bucket id for an array<float> vector: sign
  * bits of dot products with `bits` deterministic pseudo-random planes
  * (plane components from splitmix of (seed, bit, dim) — regenerated
  * on the fly, no plane matrix broadcast). */
case class HyperplaneSignBits(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with HashKernelCodegen {
  require(bits >= 1 && bits <= 63)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sign_bits"

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var bucket = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val plane = HashMix.mix(seed ^ (b.toLong << 32) ^ i.toLong)
        dot += arr.getFloat(i) * (plane.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (dot >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word k-gram shingles of a token array, one imperative pass
  * (the HOF formulation — transform(sequence) + slice + concat_ws +
  * array_distinct — pays four interpreted passes and O(n·k) temp
  * arrays per row). */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with HashKernelCodegen {
  require(k >= 1)

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= n - k) {
      var s = toks.getUTF8String(i)
      var j = 1
      while (j < k) {
        s = UTF8String.concat(s, WordShingles.SPACE, toks.getUTF8String(i + j))
        j += 1
      }
      seen.add(s)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingles {
  private val SPACE = UTF8String.fromString(" ")
}

/** Distinct xxhash64 hashes of every variant of a string obtainable by
  * deleting up to `maxDeletions` code points — the FastSS deletion
  * neighborhood (Bocek et al., "Fast Similarity Search in Large
  * Dictionaries", 2007), including the 0-deletion variant (the string
  * itself).
  *
  * Two strings with edit distance ≤ d always share a variant: walk an
  * optimal alignment and delete the edited position(s) from whichever
  * side carries them — both sides reduce to the common subsequence with
  * ≤ d deletions each. So an equi-join on these hashes is a COMPLETE
  * blocking key for bounded edit distance (no false negatives; hash
  * collisions and unrelated shared variants are removed by the exact
  * `levenshtein` verify). Emitting the 8-byte hash instead of the
  * variant string keeps the exploded join input narrow.
  *
  * Neighborhood size is C(len, ≤ maxDeletions) — sized for short
  * record-linkage keys (names, titles, codes), not documents; for long
  * text use the MinHash/SimHash paths. */
case class DeletionHashes(child: Expression, maxDeletions: Int)
    extends UnaryExpression with HashKernelCodegen {
  require(maxDeletions >= 0 && maxDeletions <= 3,
    s"deletion_hashes supports 0..3 deletions (C(len,d) variants per row), got $maxDeletions")

  // analysis-time check: the SQL registration passes the argument raw,
  // so without this a non-string input would pass analysis and throw
  // ClassCastException executor-side
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deletion_hashes requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deletion_hashes"

  def compute(v: UTF8String): ArrayData = {
    val cps = v.toString.codePoints().toArray
    val n = cps.length
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(n)
    val del = new Array[Int](math.max(maxDeletions, 1))

    def emit(nDel: Int): Unit = {
      sb.setLength(0)
      var i = 0
      var j = 0
      while (i < n) {
        if (j < nDel && del(j) == i) j += 1
        else sb.appendCodePoint(cps(i))
        i += 1
      }
      out.add(HashMix.hashString(UTF8String.fromString(sb.toString)))
    }

    // all ascending position combinations of size k, then emit
    def choose(start: Int, k: Int, filled: Int): Unit =
      if (k == 0) emit(filled)
      else {
        var p = start
        while (p <= n - k) {
          del(filled) = p
          choose(p + 1, k - 1, filled + 1)
          p += 1
        }
      }

    var d = 0
    val dMax = math.min(maxDeletions, n)
    while (d <= dMax) { choose(0, d, 0); d += 1 }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue; i += 1 }
    new GenericArrayData(arr)
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {
  def wordShingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), k))

  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes, seed))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def hyperplaneSignBits(vec: Column, bits: Int, seed: Long): Column =
    ColumnBridge.column(HyperplaneSignBits(ColumnBridge.expression(vec), bits, seed))

  def deletionHashes(str: Column, maxDeletions: Int): Column =
    ColumnBridge.column(DeletionHashes(ColumnBridge.expression(str), maxDeletions))
}
