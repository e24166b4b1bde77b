package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** `morton_interleave(a, b)` — the 2-D Z-order (Morton) key: bit i of
  * `a` lands at position 2i, bit i of `b` at 2i+1, giving one sort key
  * under which records close in EITHER dimension cluster into the same
  * storage neighborhoods. Sorting a table by this key before writing
  * bounds every file's (min, max) range in *both* columns, so
  * parquet/Delta min-max pruning skips files for predicates on either
  * dimension — the layout trick behind Delta `OPTIMIZE ZORDER BY`,
  * which matters precisely at the 100 TB scale where a linear sort
  * leaves the secondary column spread across every file.
  *
  * Inputs are masked to their low 31 bits (non-negative ints cover the
  * common id/date-epoch cases; pre-rank skewed or 64-bit domains into
  * dense 31-bit ranks first). The interleave is the standard
  * mask-and-shift bit spread (public-domain bit twiddling), O(1) per
  * row and codegen-friendly. */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"morton_interleave expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "morton_interleave"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  def compute(a: Long, b: Long): Long = MortonInterleave.interleave(a, b)

  // reference-object call, same pattern as HashKernelCodegen: keeps the
  // expression inside whole-stage codegen without hand-rolled Java
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {
  /** Spread the low 31 bits of `v` to even positions (0, 2, 4, ...). */
  @inline def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 62-bit Morton code of the two low-31-bit inputs. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Column API for Z-order clustering. */
object ZOrder {
  /** Morton key of two non-negative columns (low 31 bits each). */
  def zorder(a: Column, b: Column): Column =
    ColumnBridge.column(MortonInterleave(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))

  /** ANSI-SQL rendering of [[MortonInterleave.interleave]] over the
    * column expressions `a` and `b` — one `((x >> i) & 1) << p` term
    * per bit, summed (the spread bits are disjoint, so `+` equals the
    * bitwise OR of the kernel). Lets an external engine recompute the
    * exact Morton key for oracle comparison. */
  def mortonSql(a: String, b: String, bits: Int = 31): String = {
    require(bits >= 1 && bits <= 31)
    // operands are cast to BIGINT inside each term: an INTEGER-typed
    // column would otherwise overflow DuckDB's left shift at bit >= 31
    val terms = (0 until bits).flatMap(i => Seq(
      s"(((CAST(($a) AS BIGINT) >> $i) & 1) << ${2 * i})",
      s"(((CAST(($b) AS BIGINT) >> $i) & 1) << ${2 * i + 1})"))
    terms.mkString("(", " + ", ")")
  }

  /** Write `df` as `numFiles` parquet parts range-clustered on the
    * Morton key of (a, b): every file covers a compact Z-curve segment,
    * so its min-max footer range is bounded in BOTH columns and a
    * predicate on either prunes files at scan (Delta `OPTIMIZE ZORDER
    * BY` analog over plain parquet). */
  def clusteredWrite(df: org.apache.spark.sql.DataFrame,
                     a: Column, b: Column,
                     path: String, numFiles: Int): Unit =
    df.withColumn("__z", zorder(a, b))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
