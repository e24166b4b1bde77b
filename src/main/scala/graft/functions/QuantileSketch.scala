package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Log-bucketed quantile sketch with a RELATIVE-error guarantee
  * (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees", VLDB 2019).
  *
  * Values map to geometric buckets `i = ceil(log_γ |x|)` with
  * γ = (1+α)/(1−α); reading back the bucket midpoint `2γ^i/(γ+1)`
  * guarantees `|est − true| ≤ α·|true|` for every quantile, any data
  * distribution, as long as no collapse occurred. Merging two sketches
  * is bucket-count addition — lossless and order-independent, which is
  * what lets the aggregate fold each partition locally and ship
  * O(buckets) per task across the exchange, and what lets the keyed
  * state store carry one serialized sketch per key across micro-batches
  * (the `quantileState`/`quantileMerge` AggregatingMergeTree analog).
  *
  * Bucket maps are bounded by `maxBuckets` per sign: on overflow the
  * LOWEST-magnitude buckets collapse into one (DDSketch's policy), so
  * extreme-tail quantiles stay exact and the guarantee degrades only
  * near the collapsed low end. α = 0.01 spans ~2300 buckets per decade
  * range of e^… — in practice a few KB per key. */
final class DDSketchBuf(val alpha: Double, val maxBuckets: Int) {
  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
  val gamma: Double = (1 + alpha) / (1 - alpha)
  private val logGamma = math.log(gamma)

  val pos = mutable.HashMap.empty[Int, Long]   // buckets for x > 0
  val neg = mutable.HashMap.empty[Int, Long]   // buckets for |x|, x < 0
  var zeroCount: Long = 0L
  var count: Long = 0L

  @inline private def bucket(absX: Double): Int =
    math.ceil(math.log(absX) / logGamma).toInt
  @inline private def value(i: Int): Double =
    2.0 * math.pow(gamma, i) / (gamma + 1)

  def add(x: Double): Unit = {
    if (x.isNaN) return // NaN is no rank: skipped like SQL null
    if (x > 0) bump(pos, bucket(x))
    else if (x < 0) bump(neg, bucket(-x))
    else zeroCount += 1
    count += 1
  }

  private def bump(m: mutable.HashMap[Int, Long], i: Int, by: Long = 1L): Unit = {
    m.update(i, m.getOrElse(i, 0L) + by)
    if (m.size > maxBuckets) collapseLowest(m)
  }

  /** Fold the two lowest-magnitude buckets together (preserves total
    * count and tail accuracy; the collapsed range loses the α bound). */
  private def collapseLowest(m: mutable.HashMap[Int, Long]): Unit = {
    val ks = m.keys.toArray.sorted
    val c0 = m.remove(ks(0)).get
    m.update(ks(1), m(ks(1)) + c0)
  }

  def mergeFrom(o: DDSketchBuf): DDSketchBuf = {
    require(o.alpha == alpha,
      s"cannot merge sketches with different alpha: $alpha vs ${o.alpha}")
    o.pos.foreach { case (i, c) => bump(pos, i, c) }
    o.neg.foreach { case (i, c) => bump(neg, i, c) }
    zeroCount += o.zeroCount
    count += o.count
    this
  }

  /** Quantile estimate; NaN on an empty sketch. Interpolates linearly
    * between the bracketing order statistics (rank `⌊q·(n-1)⌋` and its
    * successor) like `percentile_cont`/DDSketch reference
    * implementations — on sparse groups the floor-rank statistic alone
    * can sit a whole inter-value gap away from the interpolated
    * percentile even when each bucket honors the α bound. */
  def quantile(q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1]: $q")
    if (count == 0L) return Double.NaN
    val rankF = q * (count - 1) // 0-based fractional target rank
    val lo = rankF.toLong
    val frac = rankF - lo
    val vLo = valueAtRank(lo)
    if (frac == 0.0) vLo
    else vLo + (valueAtRank(lo + 1) - vLo) * frac
  }

  /** Order statistic at 0-based `rank`. Walks buckets in ascending
    * numeric order: negatives by descending |x|, zero, positives by
    * ascending x. */
  private def valueAtRank(rank: Long): Double = {
    var seen = 0L
    for (i <- neg.keys.toArray.sorted(Ordering.Int.reverse)) {
      seen += neg(i)
      if (seen > rank) return -value(i)
    }
    seen += zeroCount
    if (seen > rank) return 0.0
    for (i <- pos.keys.toArray.sorted) {
      seen += pos(i)
      if (seen > rank) return value(i)
    }
    // numerically unreachable; defend against rounding
    if (pos.nonEmpty) value(pos.keys.max)
    else if (zeroCount > 0) 0.0 else -value(neg.keys.min)
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(alpha); out.writeInt(maxBuckets)
    out.writeLong(zeroCount); out.writeLong(count)
    out.writeInt(pos.size)
    pos.foreach { case (i, c) => out.writeInt(i); out.writeLong(c) }
    out.writeInt(neg.size)
    neg.foreach { case (i, c) => out.writeInt(i); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }
}

object DDSketchBuf {
  def deserialize(bytes: Array[Byte]): DDSketchBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new DDSketchBuf(in.readDouble(), in.readInt())
    buf.zeroCount = in.readLong(); buf.count = in.readLong()
    var n = in.readInt()
    while (n > 0) { buf.pos.update(in.readInt(), in.readLong()); n -= 1 }
    n = in.readInt()
    while (n > 0) { buf.neg.update(in.readInt(), in.readLong()); n -= 1 }
    buf
  }
}

/** `dd_sketch_agg(x, alpha, maxBuckets)` — aggregate a numeric column
  * into a serialized DDSketch (binary). Partial aggregation folds each
  * partition to O(buckets) before the exchange. */
case class DDSketchAgg(
    child: Expression,
    alpha: Double = 0.01,
    maxBuckets: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketchBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dd_sketch_agg expects double input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): DDSketchBuf =
    new DDSketchBuf(alpha, maxBuckets)

  override def update(buf: DDSketchBuf, input: InternalRow): DDSketchBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DDSketchBuf, other: DDSketchBuf): DDSketchBuf =
    buf.mergeFrom(other)

  override def eval(buf: DDSketchBuf): Any = buf.serialize()
  override def serialize(buf: DDSketchBuf): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): DDSketchBuf = DDSketchBuf.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): DDSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "dd_sketch_agg"
}

/** `dd_sketch_merge(sketch)` — union serialized DDSketches (the
  * `quantileMerge` analog). The empty-group result is an empty sketch
  * whose quantiles read NaN→null. Used by the keyed sketch store to
  * collapse a stored sketch with each micro-batch's partials. */
case class DDSketchMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[DDSketchBuf]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dd_sketch_merge expects a binary sketch, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Option[DDSketchBuf] = None

  override def update(buf: Option[DDSketchBuf], input: InternalRow): Option[DDSketchBuf] = {
    val v = child.eval(input)
    // zero-length bytes are this aggregate's own empty-group output —
    // skipped like null, so re-merging stored states never invents an
    // alpha that could mismatch the real sketches'
    if (v == null || v.asInstanceOf[Array[Byte]].isEmpty) buf
    else {
      val s = DDSketchBuf.deserialize(v.asInstanceOf[Array[Byte]])
      buf match {
        case Some(acc) => Some(acc.mergeFrom(s))
        case None => Some(s)
      }
    }
  }

  override def merge(buf: Option[DDSketchBuf], other: Option[DDSketchBuf]): Option[DDSketchBuf] =
    (buf, other) match {
      case (Some(a), Some(b)) => Some(a.mergeFrom(b))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buf: Option[DDSketchBuf]): Any =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)

  override def serialize(buf: Option[DDSketchBuf]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(b: Array[Byte]): Option[DDSketchBuf] =
    if (b.isEmpty) None else Some(DDSketchBuf.deserialize(b))

  override def withNewMutableAggBufferOffset(o: Int): DDSketchMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "dd_sketch_merge"
}

/** `dd_sketch_quantile(sketch, q)` — read one quantile from a
  * serialized sketch; null on an empty sketch. Deserializes per call
  * (sketch columns differ row to row — this is the state-store read
  * path, O(buckets) per row, not a hot inner loop). */
case class DDSketchQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dd_sketch_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dd_sketch_quantile expects (binary, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  def compute(bytes: Array[Byte], q: Double): java.lang.Double = {
    if (bytes.isEmpty) return null
    val est = DDSketchBuf.deserialize(bytes).quantile(q)
    if (est.isNaN) null else java.lang.Double.valueOf(est)
  }

  override def nullSafeEval(sk: Any, q: Any): Any =
    compute(sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (sk, q) => s"""
      java.lang.Double r = $ref.compute($sk, $q);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object QuantileSketch {
  /** Aggregate `x` into a serialized DDSketch. */
  def sketchAgg(x: Column, alpha: Double = 0.01, maxBuckets: Int = 4096): Column =
    ColumnBridge.column(
      DDSketchAgg(ColumnBridge.expression(x.cast("double")), alpha, maxBuckets)
        .toAggregateExpression())

  /** Union serialized sketches (state-store collapse). */
  def merge(sketch: Column): Column =
    ColumnBridge.column(
      DDSketchMerge(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Read a quantile out of a serialized sketch. */
  def quantile(sketch: Column, q: Double): Column =
    ColumnBridge.column(DDSketchQuantile(
      ColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(q, DoubleType)))
}
