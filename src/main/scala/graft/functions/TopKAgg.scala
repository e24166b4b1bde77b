package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: (score, id) pairs, keep the k largest scores
  * (ties broken toward smaller id for determinism). */
final class TopKBuffer(val k: Int) {
  // simple binary min-heap on (score, -id): root = current worst kept
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def worse(i: Int, j: Int): Boolean =
    scores(i) < scores(j) || (scores(i) == scores(j) && ids(i) > ids(j))

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(i, p)) { swap(i, p); i = p } else return
    }
  }
  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(l, m)) m = l
      if (r < n && worse(r, m)) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }
  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def add(score: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (score > scores(0) || (score == scores(0) && id < ids(0))) {
      scores(0) = score; ids(0) = id; siftDown()
    }
  }

  def mergeFrom(o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
    this
  }

  /** (id, score) pairs sorted by score desc, id asc. */
  def sorted: Array[(Long, Double)] =
    (0 until n).map(i => (ids(i), scores(i))).toArray
      .sortBy { case (id, s) => (-s, id) }
}

/** `top_k_by(score, id, k)` — aggregate returning the k (id, score)
  * pairs with the largest scores as `array<struct<id,score>>`.
  *
  * This is the scale-correct top-k-by-distance for similarity search:
  * a `TypedImperativeAggregate` participates in partial aggregation,
  * so each task reduces its partition to k rows *before* the shuffle —
  * the naive `Window.orderBy(score).row_number <= k` instead shuffles
  * every candidate row to one partition per query. With B buckets of
  * candidates and k=10, the shuffle is B·k rows, not the full pairwise
  * score matrix.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false

  // update() downcasts to Double/Long — reject anything else at
  // analysis time instead of ClassCastException executor-side.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by expects (score: double, id: bigint, k), got " +
        s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer =
    buf.mergeFrom(other)

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sorted.map { case (id, score) =>
      InternalRow(id, score)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt(); val n = in.readInt()
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id = in.readLong()
      buf.add(s, id); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "top_k_by"
}

object TopKAgg {
  import org.apache.spark.sql.functions.udaf

  /** Column API: `topKBy(score, id, k)` → array<struct<id,score>>. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
