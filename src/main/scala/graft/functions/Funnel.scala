package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Growable (timestamp, stepBits) event buffer for funnel evaluation.
  * Only rows matching at least one funnel step are ever inserted
  * (update() drops bits==0), so per-key memory is O(step events), not
  * O(all events) — the same bound ClickHouse's windowFunnel state has.
  */
final class FunnelBuffer(initialCapacity: Int = 16) {
  var ts = new Array[Long](initialCapacity)
  var bits = new Array[Int](initialCapacity)
  var n = 0

  def add(t: Long, b: Int): Unit = {
    if (n == ts.length) {
      ts = java.util.Arrays.copyOf(ts, n * 2)
      bits = java.util.Arrays.copyOf(bits, n * 2)
    }
    ts(n) = t; bits(n) = b; n += 1
  }

  def mergeFrom(o: FunnelBuffer): FunnelBuffer = {
    var i = 0
    while (i < o.n) { add(o.ts(i), o.bits(i)); i += 1 }
    this
  }

  /** Deepest funnel level reached (0..steps) under the anchored-greedy
    * strict-increase semantics documented on [[WindowFunnel]]. */
  def level(window: Long, steps: Int): Int = {
    if (n == 0) return 0
    // sort events by timestamp (bits is the tiebreak only for
    // determinism of the sort itself; with strict `>` chaining,
    // same-timestamp events can never chain, so the order among
    // equal timestamps does not affect the result)
    val order = Array.range(0, n).sortBy(i => (ts(i), bits(i)))
    var lvl = 0
    var anchor = 0L // timestamp of the first step-1 event
    var cur = 0L    // timestamp of the last chained event
    var j = 0
    while (j < n && lvl < steps) {
      val i = order(j)
      val t = ts(i); val b = bits(i)
      if (lvl == 0) {
        if ((b & 1) != 0) { anchor = t; cur = t; lvl = 1 }
      } else if ((b & (1 << lvl)) != 0 && t > cur && t <= anchor + window) {
        cur = t; lvl += 1
      }
      j += 1
    }
    lvl
  }
}

/** `window_funnel(ts, bits, window, steps)` — deepest step of an
  * ordered event chain completed within `window` of the chain's first
  * event; the one-shuffle funnel-depth aggregate (ClickHouse
  * `windowFunnel` analog; the reference stack exposes ClickHouse's
  * aggregate surface, see SURVEY.md §2.5).
  *
  * Semantics (anchored greedy, strict increase — deterministic and
  * SQL-expressible, which is what makes q70 oracle-able):
  *  - t₁ = MIN ts among step-1 events (the anchor);
  *  - tᵢ₊₁ = MIN ts among step-(i+1) events with ts > tᵢ and
  *    ts ≤ t₁ + window;
  *  - result = deepest level assigned (0 when no step-1 event).
  *
  * This differs from ClickHouse's base `windowFunnel` mode in two
  * documented ways: the anchor is the *earliest* step-1 event
  * (ClickHouse re-anchors on every later step-1 occurrence, an
  * order-sensitive heuristic) and chaining requires strictly
  * increasing timestamps (ClickHouse's `strict_increase` mode). Both
  * choices make the result a pure function of the event *set* —
  * permutation-invariant, hence safe under Spark's nondeterministic
  * partial-aggregation merge order.
  *
  * Scale shape: `TypedImperativeAggregate` with map-side partials —
  * each task buffers only its partition's *step* events (bits==0 rows
  * are dropped in update), so the shuffle carries one (ts,bits) pair
  * per matching event, grouped by key, and the sort happens once per
  * key at eval. The declarative alternative (one filtered-min
  * aggregation + join back per step) costs `steps` shuffles of the
  * whole key space; this is one.
  */
/** Shared (ts, bits) event-buffer plumbing for the funnel-family
  * aggregates: condition-matching events buffered on the map side
  * (bits==0 dropped in update), one wire format, one merge. Concrete
  * aggregates supply only `eval`. */
trait FunnelEventAggregate extends TypedImperativeAggregate[FunnelBuffer] {
  def tsExpr: Expression
  def bitsExpr: Expression

  override def children: Seq[Expression] = Seq(tsExpr, bitsExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (tsExpr.dataType == LongType && bitsExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ts: bigint, bits: int), got " +
        s"(${tsExpr.dataType.simpleString}, ${bitsExpr.dataType.simpleString})")

  override def createAggregationBuffer(): FunnelBuffer = new FunnelBuffer()

  override def update(buf: FunnelBuffer, input: InternalRow): FunnelBuffer = {
    val t = tsExpr.eval(input)
    val b = bitsExpr.eval(input)
    if (t != null && b != null) {
      val bi = b.asInstanceOf[Int]
      if (bi != 0) buf.add(t.asInstanceOf[Long], bi)
    }
    buf
  }

  override def merge(buf: FunnelBuffer, other: FunnelBuffer): FunnelBuffer =
    buf.mergeFrom(other)

  override def serialize(buf: FunnelBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeLong(buf.ts(i)); out.writeInt(buf.bits(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FunnelBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new FunnelBuffer(math.max(n, 1))
    var i = 0
    while (i < n) { val t = in.readLong(); val b = in.readInt(); buf.add(t, b); i += 1 }
    buf
  }
}

case class WindowFunnel(
    tsExpr: Expression,
    bitsExpr: Expression,
    window: Long,
    steps: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FunnelEventAggregate {

  require(steps >= 1 && steps <= 30, s"window_funnel supports 1..30 steps, got $steps")
  require(window >= 0, s"window_funnel window must be >= 0, got $window")

  override def dataType: DataType = IntegerType

  override def eval(buf: FunnelBuffer): Any = buf.level(window, steps)

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tsExpr = newChildren(0), bitsExpr = newChildren(1))
  override def prettyName: String = "window_funnel"
}

/** `sequence_count(ts, bits, steps)` — number of non-overlapping
  * completions of the ordered condition chain in a key's event stream
  * (ClickHouse `sequenceCount('(?1).*(?2)…')` analog; `sequenceMatch`
  * is `count >= 1`). Shares [[FunnelBuffer]] with [[WindowFunnel]]:
  * map-side partials buffer only condition-matching events, the greedy
  * scan runs once per key at eval.
  *
  * Semantics: events sorted by `(ts, bits)` — a deterministic total
  * order, so the result is a pure function of the event set and safe
  * under Spark's partial-merge reordering (ClickHouse leaves same-ts
  * order undefined). The scan is the standard greedy subsequence
  * matcher: at level i it advances on the first event with bit i set,
  * counting a completion and resetting at the last level. Greedy is
  * optimal for subsequence existence, so the count equals the maximum
  * number of disjoint left-to-right completions — and equals global
  * lazy-regex matching of `c1.*?c2.*?…` over the ordered event string,
  * which is how the DuckDB oracle renders it. Unlike [[WindowFunnel]]
  * there is no time window and chaining allows equal timestamps in
  * sort order (pattern semantics, not session semantics). */
case class SequenceCount(
    tsExpr: Expression,
    bitsExpr: Expression,
    steps: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FunnelEventAggregate {

  require(steps >= 1 && steps <= 30, s"sequence_count supports 1..30 steps, got $steps")

  override def dataType: DataType = LongType

  override def eval(buf: FunnelBuffer): Any = {
    val order = Array.range(0, buf.n).sortBy(i => (buf.ts(i), buf.bits(i)))
    var lvl = 0
    var count = 0L
    var j = 0
    while (j < buf.n) {
      if ((buf.bits(order(j)) & (1 << lvl)) != 0) {
        lvl += 1
        if (lvl == steps) { count += 1; lvl = 0 }
      }
      j += 1
    }
    count
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tsExpr = newChildren(0), bitsExpr = newChildren(1))
  override def prettyName: String = "sequence_count"
}

/** `sequence_count_t(ts, bits, steps, gap1..gap_{steps-1})` — the
  * time-constrained form of [[SequenceCount]]: ClickHouse's
  * `sequenceCount('(?1)(?t<=g1)(?2)(?t<=g2)(?3)')` shape, where each
  * transition i→i+1 must happen within `maxGaps(i-1)` time units of
  * the previous matched event.
  *
  * Semantics (deterministic, permutation-invariant — a pure function
  * of the event set, like every aggregate in this family):
  * events scan in `(ts, bits)` order;
  *  - a chain at level L > 0 TIMES OUT the moment an event arrives
  *    with `ts − lastMatched > maxGaps(L−1)` (timestamps only
  *    increase, so the chain could never complete — it resets before
  *    the event is considered);
  *  - a surviving chain advances on an event carrying the next step's
  *    bit (`ts` delta necessarily within the gap), completing and
  *    resetting at the last step (non-overlapping, as in the
  *    untimed form);
  *  - at level 0 any event with bit 1 starts a chain — including an
  *    event that just timed a chain out.
  * With all gaps = Long.MaxValue this is EXACTLY [[SequenceCount]]
  * (the spec's differential partner). */
case class SequenceCountTimed(
    tsExpr: Expression,
    bitsExpr: Expression,
    steps: Int,
    maxGaps: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FunnelEventAggregate {

  require(steps >= 2 && steps <= 30,
    s"sequence_count_t supports 2..30 steps, got $steps")
  require(maxGaps.size == steps - 1,
    s"sequence_count_t needs one gap per transition: " +
      s"${steps - 1} expected, got ${maxGaps.size}")
  require(maxGaps.forall(_ >= 0), s"gaps must be >= 0, got $maxGaps")

  override def dataType: DataType = LongType

  override def eval(buf: FunnelBuffer): Any = {
    val order = Array.range(0, buf.n).sortBy(i => (buf.ts(i), buf.bits(i)))
    val gaps = maxGaps.toArray
    var lvl = 0
    var last = 0L
    var count = 0L
    var j = 0
    while (j < buf.n) {
      val i = order(j)
      val t = buf.ts(i); val b = buf.bits(i)
      if (lvl > 0 && t - last > gaps(lvl - 1)) lvl = 0 // timeout first
      if (lvl > 0) {
        if ((b & (1 << lvl)) != 0) {
          lvl += 1; last = t
          if (lvl == steps) { count += 1; lvl = 0 }
        }
      } else if ((b & 1) != 0) { lvl = 1; last = t }
      j += 1
    }
    count
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceCountTimed =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceCountTimed =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tsExpr = newChildren(0), bitsExpr = newChildren(1))
  override def prettyName: String = "sequence_count_t"
}

/** Column-API entry points for funnel/retention analytics. */
object Funnel {

  /** Bitmask column: bit i set ⇔ `conds(i)` holds. Computed in the
    * (codegen'd) projection feeding the aggregate, so the aggregate's
    * input is two narrow columns. */
  def stepBits(conds: Seq[Column]): Column = {
    require(conds.nonEmpty && conds.size <= 30,
      s"funnel supports 1..30 steps, got ${conds.size}")
    conds.zipWithIndex
      .map { case (c, i) => when(c, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_.bitwiseOR(_))
  }

  /** `windowFunnel(tsMicros, windowMicros, step1, step2, ...)` —
    * deepest funnel level per group; see [[WindowFunnel]] for exact
    * semantics. `ts` is any monotone long (µs since epoch by
    * convention, matching `unix_micros`). */
  def windowFunnel(tsMicros: Column, windowMicros: Long, conds: Seq[Column]): Column =
    ColumnBridge.column(WindowFunnel(
      ColumnBridge.expression(tsMicros.cast("long")),
      ColumnBridge.expression(stepBits(conds).cast("int")),
      windowMicros, conds.size).toAggregateExpression())

  /** `sequenceCount(tsMicros, cond1, cond2, ...)` — non-overlapping
    * ordered-chain completions per group; see [[SequenceCount]]. */
  def sequenceCount(tsMicros: Column, conds: Seq[Column]): Column =
    ColumnBridge.column(SequenceCount(
      ColumnBridge.expression(tsMicros.cast("long")),
      ColumnBridge.expression(stepBits(conds).cast("int")),
      conds.size).toAggregateExpression())

  /** `sequenceMatch(tsMicros, cond1, cond2, ...)` — true iff the
    * ordered chain occurs at least once (ClickHouse `sequenceMatch`). */
  def sequenceMatch(tsMicros: Column, conds: Seq[Column]): Column =
    sequenceCount(tsMicros, conds) >= 1

  /** `sequenceCountTimed(tsMicros, conds, maxGaps)` — the
    * `(?t<=n)`-constrained chain count; `maxGaps(i)` bounds the
    * transition from step i+1 to step i+2 (so `maxGaps.size ==
    * conds.size - 1`). See [[SequenceCountTimed]] for exact
    * semantics. */
  def sequenceCountTimed(tsMicros: Column, conds: Seq[Column],
                         maxGaps: Seq[Long]): Column =
    ColumnBridge.column(SequenceCountTimed(
      ColumnBridge.expression(tsMicros.cast("long")),
      ColumnBridge.expression(stepBits(conds).cast("int")),
      conds.size, maxGaps).toAggregateExpression())

  /** Retention flags (ClickHouse `retention` analog): flag 1 is "the
    * anchor condition ever held"; flag i>1 is "the anchor AND
    * condition i both held" (co-occurrence, no ordering — exactly the
    * ClickHouse contract). Use inside `.agg(...)`: each returned
    * column is an aggregate expression; sum the flags across groups
    * for the cohort report. */
  def retentionFlags(conds: Seq[Column]): Seq[Column] = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val anchor = max(when(conds.head, 1).otherwise(0))
    anchor +: conds.tail.map(c =>
      least(anchor, max(when(c, 1).otherwise(0))))
  }
}
