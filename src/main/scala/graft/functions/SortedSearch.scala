package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Least element of a SORTED static long array that is `>= child`,
  * or `default` (the array head, for ring wraparound) when none — the
  * clockwise-successor lookup of consistent hashing, as a codegen'd
  * binary search.
  *
  * Why an Expression and not `array_min(filter(lit(arr), …))`: higher-
  * order functions evaluate their lambda per element interpreted
  * (no codegen), which measured ~5s for 150k rows × a 1088-entry ring;
  * the binary search is O(log n) per row inside whole-stage codegen.
  * The table side stays a scan — the ring is O(shards·vnodes) and
  * rides into each task as a reference object, exactly like a
  * broadcast variable. */
case class SortedCeil(child: Expression, codes: Array[Long], default: Long)
    extends UnaryExpression {
  require(codes.nonEmpty, "codes must be non-empty")
  require((1 until codes.length).forall(i => codes(i - 1) <= codes(i)),
    "codes must be sorted ascending")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_ceil requires a bigint argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_ceil"

  override protected def nullSafeEval(v: Any): Any =
    SortedCeil.ceil(codes, v.asInstanceOf[Long], default)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("codes", codes, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SortedCeil.ceil($arr, $c, ${default}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedCeil =
    copy(child = newChild)
}

object SortedCeil {
  /** Shared by interpreted eval and generated code. */
  def ceil(codes: Array[Long], v: Long, default: Long): Long = {
    val i = java.util.Arrays.binarySearch(codes, v)
    if (i >= 0) codes(i)
    else {
      val ins = -i - 1
      if (ins >= codes.length) default else codes(ins)
    }
  }

  def sortedCeil(c: Column, codes: Array[Long], default: Long): Column =
    ColumnBridge.column(SortedCeil(ColumnBridge.expression(c), codes, default))
}
