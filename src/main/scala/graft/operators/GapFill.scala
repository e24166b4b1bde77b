package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series gap filling — the `ORDER BY ... WITH FILL STEP n`
  * analog (reference stack surface: ClickHouse result-set fill): a
  * grouped time series gains one row per `step` tick over each
  * group's own [min, max] range, with absent ticks carrying fill
  * values instead of silently missing.
  *
  * Scale shape: one aggregation finds each group's span (partial
  * min/max before the exchange), `sequence()` + `explode` generates
  * the dense axis — O(span/step) rows per group, produced straight
  * from the span row without touching the fact table again — and one
  * left equi-join on (group, tick) attaches the observed values. No
  * window over the dense axis, no driver-side range materialization;
  * skew follows the span length, not the event count. */
object GapFill {

  /** Dense `stepSec`-spaced axis per group over each group's observed
    * [min, max] epoch-second range (ticks are floored to step
    * multiples, so observed rows land exactly on axis points).
    *
    * @param df        input rows
    * @param tsCol     timestamp column (castable to timestamp)
    * @param groupCols grouping key columns (may be empty for a global
    *                  series)
    * @param aggs      named aggregates evaluated per (group, tick),
    *                  e.g. `Map("n" -> count(lit(1)))`
    * @param fill      value per aggregate name for absent ticks
    *                  (defaults to 0L)
    * @return one row per (group, tick): groupCols, `tick` timestamp,
    *         aggregate columns with gaps filled
    */
  def fillTimeSeries(df: DataFrame, tsCol: String, groupCols: Seq[String],
                     aggs: Map[String, Column], stepSec: Long,
                     fill: Map[String, Column] = Map.empty): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    require(aggs.nonEmpty, "need at least one aggregate")
    // integer FLOOR division (`div` truncates, `/`+cast truncates via
    // double): pre-1970 negative-epoch seconds must bucket to the tick
    // at-or-before the event, same as date_trunc/time_bucket semantics
    val secs = unix_timestamp(col(tsCol).cast("timestamp"))
    val tickSec = (secs - pmod(secs, lit(stepSec))).cast("long")
    val g = groupCols.map(col)

    val observed = df.withColumn("__tick", tickSec)
      .groupBy((g :+ col("__tick")): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }.toSeq: _*)

    val axis = df.withColumn("__tick", tickSec)
      .groupBy(g: _*)
      .agg(min(col("__tick")).as("__lo"), max(col("__tick")).as("__hi"))
      .select((g :+ explode(sequence(col("__lo"), col("__hi"),
        lit(stepSec))).as("__tick")): _*)

    val filled = axis.join(observed, groupCols :+ "__tick", "left")
    val outAggs = aggs.keys.toSeq.map { n =>
      coalesce(col(n), fill.getOrElse(n, lit(0L))).as(n)
    }
    filled.select((g :+ col("__tick").cast("timestamp").as("tick")) ++
      outAggs: _*)
  }

  /** Linear interpolation across a (possibly gap-filled) tick series:
    * null `valueCol` entries take
    * `vp + (vn − vp) · (t − tp)/(tn − tp)` from the nearest non-null
    * neighbors on each side; non-null entries pass through, and ticks
    * with a missing neighbor (before the first / after the last
    * observation) stay null. The arithmetic is a fixed double
    * expression tree per row, so a SQL oracle replays it exactly.
    *
    * Scale shape: two frame-bounded window passes (last non-null
    * looking back, first non-null looking forward) partitioned by the
    * group — the windows run over the DENSE AXIS (span/step rows per
    * group, already orders of magnitude smaller than the fact table),
    * not over raw events. `tickCol` must be integral (epoch seconds).
    */
  def interpolate(df: DataFrame, groupCols: Seq[String], tickCol: String,
                  valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(g: _*).orderBy(col(tickCol))
    val wp = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col(valueCol).isNotNull,
      struct(col(tickCol).as("t"), col(valueCol).as("v")))
    val prev = last(obs, ignoreNulls = true).over(wp)
    val next = first(obs, ignoreNulls = true).over(wn)
    val ratio = (col(tickCol) - prev.getField("t")).cast("double") /
      (next.getField("t") - prev.getField("t")).cast("double")
    val interp = prev.getField("v") +
      (next.getField("v") - prev.getField("v")) * ratio
    df.withColumn(valueCol, coalesce(col(valueCol), interp))
  }
}
