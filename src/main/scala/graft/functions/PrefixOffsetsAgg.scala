package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Per-range-partition exclusive prefix offsets, as ONE bounded-state
  * aggregate — the scale-safe replacement for the unpartitioned
  * "census window" inside [[graft.operators.Ranks]].
  *
  * `prefix_offsets(pid, w0, w1, …)` reduces the whole input to one row
  * holding `array<struct<pid, off0, tot0, off1, tot1, …>>`: for each
  * distinct `pid` (a RangePartitioner partition id — there are at most
  * `spark.sql.shuffle.partitions` of them, metadata-sized by
  * construction), `offᵢ` is the sum of weight `i` over all SMALLER
  * pids (the exclusive prefix) and `totᵢ` the grand total. Global rank
  * / cumulative sums then follow from `off + local position` after a
  * broadcast join back.
  *
  * Why an aggregate and not a window: `SUM(w) OVER (ORDER BY pid)` on
  * the pid census is bounded (≤ partitions rows) but still plans an
  * unpartitioned Window — a certified-by-allowlist exception in every
  * query that ranks through [[graft.operators.Ranks]]. This aggregate
  * computes the same offsets in the normal partial/merge protocol:
  * each task folds its rows into a `pid → sums` map (tasks see one or
  * two pids each, so partial buffers are tiny), merge unions the maps,
  * and `eval` walks the pids in order once. No window node, no
  * allowlist entry, one fewer sort, and the state is provably ≤
  * `parts` entries — the same bounded-driver-state contract as
  * [[graft.operators.Select]].
  *
  * Weight types: integral (summed as long, ANSI-checked), float/double
  * (summed as double), and decimal (summed exactly in BigDecimal,
  * output at Spark's `Sum` result precision `min(38, p+10)`). Null
  * weights are skipped (SQL SUM semantics); a pid whose weights are
  * all null contributes 0, not null — acceptable for the rank/weight
  * columns Ranks feeds (counts and non-null measures).
  */
final class PrefixOffsetsBuf(val nw: Int) {
  /** pid → per-weight running sums (Long / Double / BigDecimal). */
  val sums: mutable.HashMap[Long, Array[Any]] = mutable.HashMap.empty

  def slot(pid: Long, kinds: Array[Int]): Array[Any] =
    sums.getOrElseUpdate(pid, Array.tabulate[Any](nw) { i =>
      kinds(i) match {
        case PrefixOffsetsAgg.KindLong => java.lang.Long.valueOf(0L)
        case PrefixOffsetsAgg.KindDouble => java.lang.Double.valueOf(0.0)
        case _ => java.math.BigDecimal.ZERO
      }
    })
}

case class PrefixOffsetsAgg(
    pidExpr: Expression,
    weightExprs: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PrefixOffsetsBuf] {

  import PrefixOffsetsAgg._

  override def children: Seq[Expression] = pidExpr +: weightExprs
  override def nullable: Boolean = false

  /** 0 = long, 1 = double, 2 = decimal — fixed at plan time. */
  private lazy val kinds: Array[Int] = weightExprs.map(_.dataType match {
    case ByteType | ShortType | IntegerType | LongType => KindLong
    case FloatType | DoubleType => KindDouble
    case _: DecimalType => KindDecimal
    case other => throw new IllegalArgumentException(
      s"prefix_offsets: unsupported weight type ${other.sql}")
  }).toArray

  /** Mirror of Spark `Sum`'s result type per input type. */
  private lazy val sumTypes: Array[DataType] = weightExprs.map(_.dataType match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType => DoubleType
    case d: DecimalType =>
      DecimalType(math.min(38, d.precision + 10), d.scale)
    case other => other
  }).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (pidExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"prefix_offsets expects pid: bigint, got ${pidExpr.dataType.simpleString}")
    else weightExprs.find { w =>
      w.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | _: DecimalType => false
        case _ => true
      }
    } match {
      case Some(w) => TypeCheckResult.TypeCheckFailure(
        s"prefix_offsets: unsupported weight type ${w.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(StructType(
    StructField("pid", LongType) +:
      weightExprs.indices.flatMap(i => Seq(
        StructField(s"off$i", sumTypes(i)),
        StructField(s"tot$i", sumTypes(i)))).toSeq))

  override def createAggregationBuffer(): PrefixOffsetsBuf =
    new PrefixOffsetsBuf(weightExprs.size)

  override def update(buf: PrefixOffsetsBuf, input: InternalRow): PrefixOffsetsBuf = {
    val pid = pidExpr.eval(input)
    if (pid != null) {
      val slot = buf.slot(pid.asInstanceOf[Long], kinds)
      var i = 0
      while (i < weightExprs.size) {
        val w = weightExprs(i).eval(input)
        if (w != null) kinds(i) match {
          case KindLong =>
            slot(i) = java.lang.Long.valueOf(java.lang.Math.addExact(
              slot(i).asInstanceOf[java.lang.Long].longValue(),
              w.asInstanceOf[Number].longValue()))
          case KindDouble =>
            slot(i) = java.lang.Double.valueOf(
              slot(i).asInstanceOf[java.lang.Double].doubleValue() +
                w.asInstanceOf[Number].doubleValue())
          case _ =>
            slot(i) = slot(i).asInstanceOf[java.math.BigDecimal]
              .add(w.asInstanceOf[Decimal].toJavaBigDecimal)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: PrefixOffsetsBuf, other: PrefixOffsetsBuf): PrefixOffsetsBuf = {
    other.sums.foreach { case (pid, oslot) =>
      val slot = buf.slot(pid, kinds)
      var i = 0
      while (i < oslot.length) {
        kinds(i) match {
          case KindLong =>
            slot(i) = java.lang.Long.valueOf(java.lang.Math.addExact(
              slot(i).asInstanceOf[java.lang.Long].longValue(),
              oslot(i).asInstanceOf[java.lang.Long].longValue()))
          case KindDouble =>
            slot(i) = java.lang.Double.valueOf(
              slot(i).asInstanceOf[java.lang.Double].doubleValue() +
                oslot(i).asInstanceOf[java.lang.Double].doubleValue())
          case _ =>
            slot(i) = slot(i).asInstanceOf[java.math.BigDecimal]
              .add(oslot(i).asInstanceOf[java.math.BigDecimal])
        }
        i += 1
      }
    }
    buf
  }

  override def eval(buf: PrefixOffsetsBuf): Any = {
    val nw = buf.nw
    val pids = buf.sums.keys.toArray.sorted
    // running exclusive prefix per weight
    val run = Array.tabulate[Any](nw) { i =>
      kinds(i) match {
        case KindLong => java.lang.Long.valueOf(0L)
        case KindDouble => java.lang.Double.valueOf(0.0)
        case _ => java.math.BigDecimal.ZERO
      }
    }
    val offs = Array.ofDim[Any](pids.length, nw)
    var p = 0
    while (p < pids.length) {
      val slot = buf.sums(pids(p))
      var i = 0
      while (i < nw) {
        offs(p)(i) = run(i)
        kinds(i) match {
          case KindLong =>
            run(i) = java.lang.Long.valueOf(java.lang.Math.addExact(
              run(i).asInstanceOf[java.lang.Long].longValue(),
              slot(i).asInstanceOf[java.lang.Long].longValue()))
          case KindDouble =>
            run(i) = java.lang.Double.valueOf(
              run(i).asInstanceOf[java.lang.Double].doubleValue() +
                slot(i).asInstanceOf[java.lang.Double].doubleValue())
          case _ =>
            run(i) = run(i).asInstanceOf[java.math.BigDecimal]
              .add(slot(i).asInstanceOf[java.math.BigDecimal])
        }
        i += 1
      }
      p += 1
    }
    def out(i: Int, v: Any): Any = kinds(i) match {
      case KindLong => v.asInstanceOf[java.lang.Long].longValue()
      case KindDouble => v.asInstanceOf[java.lang.Double].doubleValue()
      case _ =>
        val dt = sumTypes(i).asInstanceOf[DecimalType]
        val d = Decimal(v.asInstanceOf[java.math.BigDecimal])
        if (!d.changePrecision(dt.precision, dt.scale))
          throw new ArithmeticException(
            s"prefix_offsets: decimal overflow at ${dt.sql}")
        d
    }
    val rows = Array.tabulate[Any](pids.length) { p2 =>
      val fields = new Array[Any](1 + 2 * nw)
      fields(0) = pids(p2)
      var i = 0
      while (i < nw) {
        fields(1 + 2 * i) = out(i, offs(p2)(i))
        fields(2 + 2 * i) = out(i, run(i))  // grand totals
        i += 1
      }
      InternalRow.fromSeq(fields.toIndexedSeq)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: PrefixOffsetsBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.nw); o.writeInt(buf.sums.size)
    buf.sums.foreach { case (pid, slot) =>
      o.writeLong(pid)
      var i = 0
      while (i < slot.length) {
        kinds(i) match {
          case KindLong => o.writeLong(slot(i).asInstanceOf[java.lang.Long].longValue())
          case KindDouble => o.writeDouble(slot(i).asInstanceOf[java.lang.Double].doubleValue())
          case _ => o.writeUTF(slot(i).asInstanceOf[java.math.BigDecimal].toString)
        }
        i += 1
      }
    }
    o.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PrefixOffsetsBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nw = in.readInt(); val n = in.readInt()
    val buf = new PrefixOffsetsBuf(nw)
    var e = 0
    while (e < n) {
      val pid = in.readLong()
      val slot = new Array[Any](nw)
      var i = 0
      while (i < nw) {
        slot(i) = kinds(i) match {
          case KindLong => java.lang.Long.valueOf(in.readLong())
          case KindDouble => java.lang.Double.valueOf(in.readDouble())
          case _ => new java.math.BigDecimal(in.readUTF())
        }
        i += 1
      }
      buf.sums.put(pid, slot)
      e += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrefixOffsetsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrefixOffsetsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pidExpr = newChildren.head, weightExprs = newChildren.tail.toSeq)
  override def prettyName: String = "prefix_offsets"
}

object PrefixOffsetsAgg {
  final val KindLong = 0
  final val KindDouble = 1
  final val KindDecimal = 2

  /** Column API: `prefixOffsets(pid, w0, w1, …)` →
    * `array<struct<pid, off0, tot0, off1, tot1, …>>`. */
  def prefixOffsets(pid: Column, weights: Seq[Column]): Column =
    ColumnBridge.column(
      PrefixOffsetsAgg(ColumnBridge.expression(pid),
        weights.map(ColumnBridge.expression))
        .toAggregateExpression())
}
