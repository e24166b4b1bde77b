package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Bloom filter over 64-bit word array; k probe positions per
  * item via double hashing (Kirsch–Mitzenmacher 2006: g_i = h1 + i·h2
  * preserves the asymptotic false-positive rate of k independent
  * hashes). Item hash is xxhash64 seed 42 — the same kernel as the
  * built-in `xxhash64` and every other hash in [[HashMix]], so filter
  * contents are deterministic across JVMs and reorderings.
  *
  * Serialized layout: Int numHashes, Int numWords, then numWords
  * big-endian longs. Merge = bitwise OR (requires identical geometry),
  * so partial filters from any partitioning union losslessly — the
  * standard mergeable-summary shape (Agarwal et al. 2012).
  */
final class BloomBuffer(val numHashes: Int, val words: Array[Long]) {
  def numBits: Long = words.length.toLong * 64L

  @inline private def probe(h64: Long, f: Long => Unit): Unit = {
    val h2 = HashMix.mix(h64) | 1L
    var i = 0
    var g = h64
    while (i < numHashes) {
      f((g & Long.MaxValue) % numBits)
      g += h2
      i += 1
    }
  }

  def add(h64: Long): Unit =
    probe(h64, bit => words((bit >>> 6).toInt) |= (1L << (bit & 63L)))

  def mightContain(h64: Long): Boolean = {
    val h2 = HashMix.mix(h64) | 1L
    var i = 0
    var g = h64
    while (i < numHashes) {
      val bit = (g & Long.MaxValue) % numBits
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      g += h2
      i += 1
    }
    true
  }

  def mergeFrom(o: BloomBuffer): BloomBuffer = {
    require(o.numHashes == numHashes && o.words.length == words.length,
      s"bloom geometry mismatch: ($numHashes,${words.length}) vs " +
        s"(${o.numHashes},${o.words.length})")
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numHashes).putInt(words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object BloomBuffer {
  /** Textbook sizing: m = n·ln(1/p)/ln²2 bits, k = m/n·ln2 probes. */
  def sized(expectedItems: Long, fpp: Double): BloomBuffer = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val ln2 = math.log(2)
    val m = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val nWordsL = math.max(1L, (m + 63L) / 64L)
    // JVM array bound, reached near n·ln(1/p) ≈ 1.4e11 bits (~16 GB) —
    // fail loudly instead of silently truncating the Int cast
    require(nWordsL <= Int.MaxValue.toLong,
      s"bloom filter too large: $expectedItems items @ fpp=$fpp needs " +
        s"$m bits; raise fpp or shard the filter")
    val nWords = nWordsL.toInt
    val k = math.max(1, math.round(m.toDouble / expectedItems * ln2).toInt)
    new BloomBuffer(k, new Array[Long](nWords))
  }

  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val n = bb.getInt()
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong(); i += 1 }
    new BloomBuffer(k, words)
  }
}

/** `bloom_filter_build(item, expectedItems, fpp)` — aggregate a string
  * column into a serialized Bloom filter (binary).
  *
  * Scale shape: each task folds its partition into one fixed-size bit
  * array before the shuffle; the exchange carries O(filter bytes) per
  * task regardless of row count, and the final merge is bitwise OR.
  * The result is the build side of a semi-join reduction: broadcast the
  * (small) filter, prefilter the (huge) probe side down to candidate
  * rows, then verify exactly — Spark's own runtime row-filtering uses
  * the identical pattern, here surfaced as a first-class operator. */
case class BloomFilterBuild(
    itemExpr: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_filter_build expects a string item, got ${itemExpr.dataType.simpleString}")

  override def createAggregationBuffer(): BloomBuffer =
    BloomBuffer.sized(expectedItems, fpp)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(HashMix.hashString(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer =
    buf.mergeFrom(other)

  override def eval(buf: BloomBuffer): Any = buf.serialize()

  override def serialize(buf: BloomBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): BloomBuffer =
    BloomBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
  override def prettyName: String = "bloom_filter_build"
}

/** `bloom_might_contain(filter, item)` — probe a serialized filter.
  * False ⇒ definitely absent; true ⇒ present or false positive.
  *
  * The filter operand must be FOLDABLE (a literal / materialized build
  * result): the bit array then deserializes ONCE per operator instance
  * instead of once per row, and the probe participates in whole-stage
  * codegen through the same reference-object bridge as the hash
  * kernels. (Spark's internal runtime-filter probe imposes the same
  * constant-filter requirement, for the same reason.) */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires a constant (foldable) filter — " +
            "materialize the build aggregate first")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val filter: BloomBuffer = {
    val bytes = left.eval(null)
    if (bytes == null) null
    else BloomBuffer.deserialize(bytes.asInstanceOf[Array[Byte]])
  }

  /** Codegen entry point — monomorphic per-row call. */
  def probe(item: UTF8String): Boolean =
    filter.mightContain(HashMix.hashString(item))

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val item = right.eval(input)
    if (item == null) null else probe(item.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      (_, item) => s"${ev.value} = $ref.probe($item);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Bloom {

  /** Column API: aggregate `item` into a serialized Bloom filter. */
  def filterAgg(item: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    ColumnBridge.column(
      BloomFilterBuild(ColumnBridge.expression(item.cast("string")),
        expectedItems, fpp).toAggregateExpression())

  /** Column API: probe a constant filter (pass the materialized build
    * result — same contract as a broadcast runtime filter). */
  def mightContain(filterBytes: Array[Byte], item: Column): Column =
    ColumnBridge.column(BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(filterBytes, BinaryType),
      ColumnBridge.expression(item.cast("string"))))

  /** Build a filter over one column of `df` and materialize it.
    *
    * The collect is ONE row holding the filter bytes — identical I/O to
    * the scalar-subquery materialization Spark's adaptive runtime
    * filters perform; all per-row work stays distributed. */
  def buildFilter(df: DataFrame, item: Column,
                  expectedItems: Long, fpp: Double = 0.01): Array[Byte] =
    df.agg(filterAgg(item, expectedItems, fpp).as("f"))
      .head().getAs[Array[Byte]]("f")
}
