package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the point-query
  * frequency summary behind ClickHouse-style `topK` pre-filters and
  * streaming rate limiters. `depth` independent hash rows of `width`
  * counters; update adds `w` to one cell per row, the point estimate is
  * the MINIMUM over the rows — a one-sided overestimate:
  * exact ≤ est ≤ exact + collisions.
  *
  * Hashing is the repo's engine-portable scheme ([[PortableHash]]):
  * base hash = top-60-bits-of-md5 mod 2³¹−1, row i's cell =
  * ((aᵢ·h + bᵢ) mod P) mod width, with (aᵢ, bᵢ) drawn from the shared
  * [[PortableHash.coeffs]] stream. Every arithmetic step stays below
  * 2⁶³ so ANY SQL engine replays the sketch bit-exactly —
  * [[CountMin.estimateSql]] emits that mirror, which is how the
  * driver's DuckDB oracle re-derives the estimates (q140).
  *
  * Scale shape: a [[TypedImperativeAggregate]] — each task folds its
  * partition into a fixed depth×width array BEFORE the exchange, so one
  * O(depth·width) buffer per task crosses the shuffle regardless of
  * input cardinality; merge is element-wise addition (counter vectors
  * form a commutative monoid, so partial aggregation is exact).
  */
final class CountMinBuf(val depth: Int, val width: Int, val seed: Long) {
  val cells = new Array[Long](depth * width)

  private val as: Array[Long] = PortableHash.coeffs(depth, seed).map(_._1).toArray
  private val bs: Array[Long] = PortableHash.coeffs(depth, seed).map(_._2).toArray

  def add(item: String, w: Long): Unit = if (w != 0L) {
    val h = PortableHash.base60ModP(PortableHash.md5Local.get(),
      item.getBytes(StandardCharsets.UTF_8))
    var i = 0
    while (i < depth) {
      cells(i * width + ((as(i) * h + bs(i)) % PortableHash.P % width).toInt) += w
      i += 1
    }
  }

  def estimate(item: String): Long = {
    val h = PortableHash.base60ModP(PortableHash.md5Local.get(),
      item.getBytes(StandardCharsets.UTF_8))
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = cells(i * width + ((as(i) * h + bs(i)) % PortableHash.P % width).toInt)
      if (c < min) min = c
      i += 1
    }
    min
  }

  def mergeFrom(o: CountMinBuf): CountMinBuf = {
    require(o.depth == depth && o.width == width && o.seed == seed,
      "cannot merge CountMin sketches with different shapes")
    var i = 0
    while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
    this
  }
}

object CountMinBuf {
  def serialize(buf: CountMinBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.depth); out.writeInt(buf.width); out.writeLong(buf.seed)
    var i = 0
    while (i < buf.cells.length) { out.writeLong(buf.cells(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): CountMinBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CountMinBuf(in.readInt(), in.readInt(), in.readLong())
    var i = 0
    while (i < buf.cells.length) { buf.cells(i) = in.readLong(); i += 1 }
    buf
  }
}

/** `cms_sketch(item, weight, depth, width, seed)` → serialized sketch
  * bytes (BinaryType) — mergeable state, same contract as the DDSketch
  * and theta states in this package (land it in a state store, union
  * later). */
case class CmsSketchAgg(
    itemExpr: Expression,
    weightExpr: Expression,
    depth: Int,
    width: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinBuf] {
  require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got $depth×$width")

  override def children: Seq[Expression] = Seq(itemExpr, weightExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    (itemExpr.dataType, weightExpr.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch expects (string, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def createAggregationBuffer(): CountMinBuf =
    new CountMinBuf(depth, width, seed)

  override def update(buf: CountMinBuf, input: InternalRow): CountMinBuf = {
    val v = itemExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      val wl = w.asInstanceOf[Long]
      require(wl >= 0, s"cms_sketch weight must be >= 0, got $wl")
      buf.add(v.asInstanceOf[UTF8String].toString, wl)
    }
    buf
  }

  override def merge(buf: CountMinBuf, other: CountMinBuf): CountMinBuf =
    buf.mergeFrom(other)

  override def eval(buf: CountMinBuf): Any = CountMinBuf.serialize(buf)

  override def serialize(buf: CountMinBuf): Array[Byte] = CountMinBuf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): CountMinBuf =
    CountMinBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0), weightExpr = newChildren(1))
}

/** `cms_estimate(sketch, item)` → the point-frequency estimate (min
  * over the depth rows). The sketch shape and seed ride in the
  * serialized header, so the expression needs no parameters. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  def compute(bytes: Array[Byte], item: UTF8String): Long =
    CountMinBuf.deserialize(bytes).estimate(item.toString)

  override def nullSafeEval(sk: Any, item: Any): Any =
    compute(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (sk, item) => s"${ev.value} = $ref.compute($sk, $item);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object CountMin {
  /** Column API: aggregate `item` (weighted by `weight`) into a
    * serialized Count-Min sketch. */
  def sketchAgg(item: Column, weight: Column, depth: Int = 4,
                width: Int = 512, seed: Long = 42L): Column =
    ColumnBridge.column(
      CmsSketchAgg(ColumnBridge.expression(item.cast("string")),
        ColumnBridge.expression(weight.cast("long")), depth, width, seed)
        .toAggregateExpression())

  /** Column API: point estimate for `item` from a serialized sketch. */
  def estimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch),
      ColumnBridge.expression(item.cast("string"))))

  /** DuckDB mirror: given a CTE `$items(tok, c)` holding the EXACT
    * per-item counts the sketch ingested, emits CTEs
    * `cmscells(tok, c, i, cell)` and `cmssums(i, cell, s)`; the
    * estimate for a token is then `(SELECT MIN(s) FROM cmssums JOIN
    * cmscells USING (i, cell) WHERE tok = ...)` — i.e.
    * `cmsest(tok, c, est)`, provided here too. Coefficients come from
    * the SAME [[PortableHash.coeffs]] stream as the Scala kernel. */
  def estimateCtes(items: String, depth: Int = 4, width: Int = 512,
                   seed: Long = 42L): String = {
    val rows = PortableHash.coeffs(depth, seed).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a::BIGINT, $b::BIGINT)" }
      .mkString(", ")
    s"""cmsh AS (
       |  SELECT tok, c,
       |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % ${PortableHash.P} AS h
       |  FROM $items
       |), cmscells AS MATERIALIZED (
       |  SELECT tok, c, i, ((a * h + b) % ${PortableHash.P}) % $width AS cell
       |  FROM cmsh CROSS JOIN (VALUES $rows) coef(i, a, b)
       |), cmssums AS MATERIALIZED (
       |  SELECT i, cell, SUM(c) AS s FROM cmscells GROUP BY i, cell
       |), cmsest AS (
       |  SELECT tok, ANY_VALUE(c) AS c, MIN(s) AS est
       |  FROM cmscells JOIN cmssums USING (i, cell)
       |  GROUP BY tok
       |)""".stripMargin
  }
}
