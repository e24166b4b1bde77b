package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Engine-portable hashing for the dedup operators whose OUTPUT must be
  * reproducible by any SQL engine (the driver's DuckDB oracle, an audit
  * pipeline, a second cluster): everything derives from the md5 hex
  * digest — a public, bit-identical primitive every engine ships — and
  * 31-bit modular arithmetic that any BIGINT SQL dialect evaluates
  * exactly (no 2^64 wraparound, which ANSI engines reject and dialects
  * disagree on).
  *
  * The xxhash64-based kernels in [[HashExpressions]] remain the
  * fastest-path forms; these portable kernels trade ~3× per-shingle
  * hash cost for cross-engine verifiability. Both share banding,
  * candidate-join, and verify stages — only the signature differs.
  *
  * The SQL mirror of `base60` is
  * {{{('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647}}}
  * (DuckDB spelling): the first 15 hex chars are the top 60 bits of the
  * digest, so the value fits a signed 64-bit integer in any dialect.
  */
object PortableHash {
  /** 2^31 - 1 (Mersenne prime): the modulus for all rehash arithmetic.
    * a·h + b with a, h, b < 2^31 stays below 2^62 + 2^31 — exact in any
    * signed-64-bit engine, no overflow anywhere. */
  val P: Long = 2147483647L

  private[graft] val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes) (= first 15 hex chars), reduced mod [[P]]. */
  @inline def base60ModP(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v >>> 4) % P
  }

  /** First and second 32-bit big-endian words of md5(bytes) — the SQL
    * mirrors are `('0x'||substr(md5(s),1,8))::BIGINT` and
    * `('0x'||substr(md5(s),9,8))::BIGINT`. */
  @inline def words32(md: MessageDigest, bytes: Array[Byte]): (Long, Long) = {
    md.reset()
    val d = md.digest(bytes)
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 4) { h1 = (h1 << 8) | (d(i) & 0xFFL); i += 1 }
    while (i < 8) { h2 = (h2 << 8) | (d(i) & 0xFFL); i += 1 }
    (h1, h2)
  }

  /** Affine rehash coefficients (a_i, b_i), a_i ∈ [1, P-1],
    * b_i ∈ [0, P-1] — the ONE source of truth shared by the Spark
    * kernel and the generated oracle SQL. */
  def coeffs(numHashes: Int, seed: Long): IndexedSeq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val a = (HashMix.mixAt(seed, 2L * i) & 0x7FFFFFFFL) % (P - 1) + 1
      val b = (HashMix.mixAt(seed, 2L * i + 1) & 0x7FFFFFFFL) % P
      (a, b)
    }
}

/** Portable MinHash signature over an array<string> shingle set: one
  * md5 per shingle, `numHashes` affine rehashes mod 2^31-1, all minima
  * folded in a single pass. Bit-reproducible by the generated DuckDB
  * oracle (see [[graft.dedup.Portable.minhashPairsSql]]). */
case class PortableMinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with HashKernelCodegen {
  require(numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "portable_minhash_signature"

  private lazy val as: Array[Long] =
    PortableHash.coeffs(numHashes, seed).map(_._1).toArray
  private lazy val bs: Array[Long] =
    PortableHash.coeffs(numHashes, seed).map(_._2).toArray

  def compute(arr: ArrayData): ArrayData = {
    val md = PortableHash.md5Local.get()
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = PortableHash.base60ModP(md, arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < numHashes) {
        val p = (as(j) * h + bs(j)) % PortableHash.P
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

/** Portable SimHash of an array<string> token list, as two 32-bit words
  * `[hi, lo]` (bits 0..31 from md5's first word, 32..63 from its
  * second). Two words instead of one 64-bit value so the SQL mirror
  * never constructs a number with the sign bit set — every engine's
  * BIGINT arithmetic stays exact and overflow-free. */
case class PortableSimHashWords(child: Expression)
    extends UnaryExpression with HashKernelCodegen {

  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "portable_simhash_words"

  def compute(arr: ArrayData): ArrayData = {
    val md = PortableHash.md5Local.get()
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val (h1, h2) = PortableHash.words32(md, arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < 32) {
        if (((h1 >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        if (((h2 >>> j) & 1L) == 1L) counters(32 + j) += 1 else counters(32 + j) -= 1
        j += 1
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 32) {
      if (counters(j) > 0) hi |= (1L << j)
      if (counters(32 + j) > 0) lo |= (1L << j)
      j += 1
    }
    new GenericArrayData(Array(hi, lo))
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PortableHashFunctions {
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long): Column =
    ColumnBridge.column(PortableMinHashSignature(
      ColumnBridge.expression(shingles), numHashes, seed))

  def simhashWords(tokens: Column): Column =
    ColumnBridge.column(PortableSimHashWords(ColumnBridge.expression(tokens)))
}
