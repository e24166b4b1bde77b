package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise running sum + count over embedding vectors. */
final class VecSumBuffer {
  var sums: Array[Double] = _
  var count: Long = 0L

  def add(a: ArrayData, isDouble: Boolean): Unit = {
    val n = a.numElements()
    if (sums == null) sums = new Array[Double](n)
    val m = math.min(n, sums.length)
    var i = 0
    while (i < m) {
      sums(i) += (if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble)
      i += 1
    }
    count += 1
  }

  def mergeFrom(o: VecSumBuffer): VecSumBuffer = {
    if (o.sums != null) {
      if (sums == null) { sums = o.sums.clone(); count = o.count; return this }
      val m = math.min(sums.length, o.sums.length)
      var i = 0
      while (i < m) { sums(i) += o.sums(i); i += 1 }
      count += o.count
    }
    this
  }
}

/** `vector_avg(vec)` — element-wise mean of an embedding column as
  * `array<double>`.
  *
  * The centroid-update step of k-means (IVF Lloyd refinement). As a
  * `TypedImperativeAggregate` it participates in partial aggregation:
  * each task reduces its partition to one (sums, count) pair per group
  * before the shuffle — only cells×tasks narrow rows cross the
  * exchange, versus the n·d row explosion of the
  * posexplode → groupBy(cell, pos) → avg formulation.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType)

  private lazy val isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vector_avg requires array<float> or array<double>, got ${other.sql}")
    }
  }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], isDouble)
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer =
    buf.mergeFrom(other)

  override def eval(buf: VecSumBuffer): Any =
    if (buf.count == 0L || buf.sums == null) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    val n = if (buf.sums == null) 0 else buf.sums.length
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(buf.sums(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecSumBuffer
    buf.count = in.readLong()
    val n = in.readInt()
    if (n > 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "vector_avg"
}

object VectorAgg {
  /** Column API: element-wise mean of an embedding column. */
  def vectorAvg(vec: Column): Column =
    ColumnBridge.column(
      VectorAvg(ColumnBridge.expression(vec)).toAggregateExpression())
}
