package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single right row with
  * the greatest `rightTs <= leftTs` within the same key — the
  * point-in-time lookup a CDC-landed store needs ("state as of event
  * time").
  *
  * Spark has no native as-of join; the scale-correct composition is the
  * union-and-carry-forward trick:
  *   1. tag and union both sides (right sorts before left on ts ties),
  *   2. one shuffle+sort on (key, ts, side),
  *   3. `last(rightCol, ignoreNulls)` over the preceding-rows window
  *      carries the latest right values forward,
  *   4. keep left rows.
  * Cost: ONE shuffle of |L|+|R| rows and a per-partition sort — no
  * range cross-product, no per-key collect, skew bounded by key
  * cardinality like any window. (A range-join would explode; a
  * broadcast-right variant only works for small R.)
  */
object AsOfJoin {

  /** @param rightValueCols right columns to attach (null when no match)
    * @param tiebreak extra ordering among equal (key, ts) right rows —
    *   the LAST by this ordering wins (deterministic). */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightValueCols: Seq[String],
                   tiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightValueCols.exists(leftCols.contains),
      "right value columns must not collide with left columns")

    val rightSchema = right.schema
    // Carry ONE struct of all right value columns, not N independent
    // last()s: per-column carry could assemble a "torn" match from
    // different right rows when some right values are null (DuckDB-style
    // ASOF attaches one whole row — so do we).
    val rvType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => rightSchema(c)))

    val tb = tiebreak.map(col).getOrElse(lit(0L))
    val lTagged = left.select(
      leftCols.map(col) :+
        col(leftTs).as("_ts") :+ lit(1).as("_side") :+ lit(0L).as("_tb") :+
        lit(null).cast(rvType).as("_rv"): _*)
    // right rows: key columns from the right (same names required),
    // non-key left columns null
    val rTagged = right.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightTs).as("_ts") :+ lit(0).as("_side") :+ tb.cast("long").as("_tb") :+
        struct(rightValueCols.map(col): _*).as("_rv"): _*)
    val merged = lTagged.unionByName(rTagged)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = merged.withColumn("_rv",
      last(col("_rv"), ignoreNulls = true).over(w))

    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c => col("_rv").getField(c).as(c)): _*)
  }
}
