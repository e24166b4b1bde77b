package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi 2005
  * — the algorithm behind ClickHouse's `topK`/`topKWeighted` family).
  *
  * Invariants: with capacity c over n items, every item with true count
  * > n/c is guaranteed present, and each reported count overestimates
  * its true count by at most the tracked `err`. When the distinct-item
  * count never exceeds c the sketch is EXACT (all errors 0) — which is
  * what lets the query layer oracle it against exact SQL counts while
  * the same operator degrades gracefully on an unbounded vocabulary.
  *
  * Merge (Agarwal et al., "Mergeability of Summaries"): counts add for
  * shared keys; a key absent from one side is credited that side's
  * eviction floor (its maximum possible uncounted occurrences), then
  * the union is pruned back to capacity, raising the floor to the
  * largest pruned count. The floor is the sketch-wide error bound.
  */
final class SpaceSaving(val capacity: Int) {
  val counts = mutable.HashMap.empty[String, (Long, Long)] // item -> (count, err)
  var floor: Long = 0L                                     // max evicted/pruned count

  def add(item: String): Unit = add(item, 1L)

  /** Weighted insert (the `topKWeighted` form): counts advance by `w`;
    * eviction credits the newcomer the evictee's count as usual, which
    * keeps the one-sided overestimate guarantee. A zero-weight row is a
    * no-op (at capacity it would otherwise evict an established counter
    * to admit a newcomer that adds nothing). */
  def add(item: String, w: Long): Unit = if (w != 0L) counts.get(item) match {
    case Some((c, e)) => counts(item) = (c + w, e)
    case None if counts.size < capacity => counts(item) = (w, 0L)
    case None =>
      val (mItem, (mCnt, _)) = counts.minBy { case (i, (c, _)) => (c, i) }
      counts.remove(mItem)
      if (mCnt > floor) floor = mCnt
      counts(item) = (mCnt + w, mCnt)
  }

  def mergeFrom(o: SpaceSaving): SpaceSaving = {
    val keys = counts.keySet ++ o.counts.keySet
    val merged = keys.iterator.map { k =>
      val (ca, ea) = counts.getOrElse(k, (floor, floor))
      val (cb, eb) = o.counts.getOrElse(k, (o.floor, o.floor))
      k -> (ca + cb, ea + eb)
    }.toSeq
    counts.clear()
    floor += o.floor
    val kept =
      if (merged.size <= capacity) merged
      else {
        val sorted = merged.sortBy { case (i, (c, _)) => (-c, i) }
        val dropped = sorted.drop(capacity)
        val dropMax = dropped.iterator.map(_._2._1).max
        if (dropMax > floor) floor = dropMax
        sorted.take(capacity)
      }
    kept.foreach { case (k, ce) => counts(k) = ce }
    this
  }

  /** (item, count, err) by count desc then item asc (deterministic). */
  def sorted: Array[(String, Long, Long)] =
    counts.iterator.map { case (i, (c, e)) => (i, c, e) }.toArray
      .sortBy { case (i, c, _) => (-c, i) }
}

/** `approx_top_k(item, k, capacity)` — heavy-hitters aggregate returning
  * the k most frequent items as `array<struct<item,cnt,err>>`.
  *
  * Scale shape: a `TypedImperativeAggregate`, so each task reduces its
  * partition to a capacity-bounded sketch BEFORE the shuffle — only
  * O(capacity) entries per task cross the exchange, vs a full
  * (group, item) count table for the exact groupBy formulation. At
  * corpus scale the vocabulary is unbounded; the sketch is the operator
  * that survives it. */
case class ApproxTopK(
    itemExpr: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] {
  require(k > 0 && capacity >= k, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (itemExpr.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"approx_top_k expects a string item, got ${itemExpr.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))))

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSaving, other: SpaceSaving): SpaceSaving =
    buf.mergeFrom(other)

  override def eval(buf: SpaceSaving): Any = {
    val rows = buf.sorted.take(k).map { case (i, c, e) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: SpaceSaving): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity); out.writeLong(buf.floor)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (i, (c, e)) =>
      val b = i.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSaving(in.readInt())
    buf.floor = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      val item = new String(b, StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.counts(item) = (c, e)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
  override def prettyName: String = "approx_top_k"
}

/** `approx_top_k_weighted(item, weight, k, capacity)` — SpaceSaving
  * with weighted increments (ClickHouse `topKWeighted` analog): items
  * rank by summed weight instead of occurrence count. Same buffer,
  * merge, and guarantees as [[ApproxTopK]] with "count" read as
  * "weight sum"; exact when distinct items fit the capacity. */
case class ApproxTopKWeighted(
    itemExpr: Expression,
    weightExpr: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] {
  require(k > 0 && capacity >= k, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(itemExpr, weightExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (itemExpr.dataType == StringType && weightExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"approx_top_k_weighted expects (string, bigint), got " +
        s"(${itemExpr.dataType.simpleString}, ${weightExpr.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))))

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = itemExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      val wl = w.asInstanceOf[Long]
      require(wl >= 0, s"approx_top_k_weighted weight must be >= 0, got $wl")
      buf.add(v.asInstanceOf[UTF8String].toString, wl)
    }
    buf
  }

  override def merge(buf: SpaceSaving, other: SpaceSaving): SpaceSaving =
    buf.mergeFrom(other)

  override def eval(buf: SpaceSaving): Any = {
    val rows = buf.sorted.take(k).map { case (i, c, e) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: SpaceSaving): Array[Byte] =
    ApproxTopK(itemExpr, k, capacity).serialize(buf)
  override def deserialize(bytes: Array[Byte]): SpaceSaving =
    ApproxTopK(itemExpr, k, capacity).deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0), weightExpr = newChildren(1))
  override def prettyName: String = "approx_top_k_weighted"
}

object HeavyHitters {
  /** Column API: `approxTopK(item, k, capacity)` →
    * array<struct<item,cnt,err>> by count desc, item asc. */
  def approxTopK(item: Column, k: Int, capacity: Int = 1024): Column =
    ColumnBridge.column(
      ApproxTopK(ColumnBridge.expression(item.cast("string")), k, capacity)
        .toAggregateExpression())

  /** Column API: `approxTopKWeighted(item, weight, k, capacity)` —
    * rank by summed weight (topKWeighted analog). */
  def approxTopKWeighted(item: Column, weight: Column, k: Int,
                         capacity: Int = 1024): Column =
    ColumnBridge.column(
      ApproxTopKWeighted(ColumnBridge.expression(item.cast("string")),
        ColumnBridge.expression(weight.cast("long")), k, capacity)
        .toAggregateExpression())
}
