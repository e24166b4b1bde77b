package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Fixed-domain bitmap for EXACT distinct counting of bounded integer
  * keys — the Roaring-bitmap idea (Chambi et al. 2016) reduced to the
  * dense container case, which is the right container when the id
  * domain is known and compact (surrogate keys, dictionary codes).
  *
  * Scale shape: each task folds its partition into one
  * `maxBits / 8`-byte buffer BEFORE the exchange, so the shuffle
  * carries O(domain/8) bytes per (task, group) regardless of row count
  * — the exact-distinct analog of the HLL state (q24): HLL trades
  * exactness for O(KB) on UNBOUNDED domains; this keeps exactness on
  * bounded ones. Merge is word-wise OR (idempotent + commutative, so
  * partial aggregation and speculative re-execution are both safe).
  * Serialization trims trailing zero words, so sparse groups ship
  * small. Out-of-domain values fail loudly — silently widening would
  * mask a mis-sized domain bound; unbounded domains belong in
  * `approx_count_distinct` / the HLL state.
  */
final class BitmapBuf(val maxBits: Int) {
  val words = new Array[Long]((maxBits + 63) >>> 6)

  def add(v: Long): Unit = {
    require(v >= 0L && v < maxBits,
      s"bitmap_distinct: value $v outside [0, $maxBits) — size maxBits to " +
        "cover the key domain (unbounded domains belong in HLL/approx_count_distinct)")
    words((v >>> 6).toInt) |= 1L << (v & 63L)
  }

  def mergeFrom(o: BitmapBuf): BitmapBuf = {
    require(o.maxBits == maxBits,
      s"cannot merge bitmaps of different domains: $maxBits vs ${o.maxBits}")
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
    this
  }

  def cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }
}

object BitmapBuf {
  def serialize(buf: BitmapBuf): Array[Byte] = {
    var last = buf.words.length
    while (last > 0 && buf.words(last - 1) == 0L) last -= 1
    val bos = new ByteArrayOutputStream(12 + last * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.maxBits)
    out.writeInt(last)
    var i = 0
    while (i < last) { out.writeLong(buf.words(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BitmapBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BitmapBuf(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.words(i) = in.readLong(); i += 1 }
    buf
  }
}

/** `bitmap_distinct(key, maxBits)` → exact distinct count (LongType)
  * of integral keys in `[0, maxBits)`. */
case class BitmapDistinctAgg(
    child: Expression,
    maxBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuf] {
  require(maxBits >= 1 && maxBits <= (1 << 28),
    s"bitmap_distinct domain must be in [1, 2^28] bits (32 MiB dense cap); got $maxBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects an integral key, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): BitmapBuf = new BitmapBuf(maxBits)

  override def update(buf: BitmapBuf, input: InternalRow): BitmapBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: BitmapBuf, other: BitmapBuf): BitmapBuf =
    buf.mergeFrom(other)

  override def eval(buf: BitmapBuf): Any = buf.cardinality

  override def serialize(buf: BitmapBuf): Array[Byte] = BitmapBuf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BitmapBuf =
    BitmapBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object Bitmap {
  /** Column API: exact distinct count of integral `key` values, all of
    * which must fall in `[0, maxBits)`. */
  def distinctCount(key: Column, maxBits: Int): Column =
    ColumnBridge.column(
      BitmapDistinctAgg(ColumnBridge.expression(key), maxBits)
        .toAggregateExpression())
}
