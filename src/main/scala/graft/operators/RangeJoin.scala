package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (value ∈ [lo, hi)) without a nested-loop plan.
  *
  * Spark plans a raw `value >= lo AND value < hi` join as
  * BroadcastNestedLoopJoin (every fact row probes every range) —
  * workable only for tiny range tables. The scale formulation bins the
  * value domain: each range row explodes to the bins it overlaps, the
  * fact side computes its bin, the join becomes an equi-join on bin,
  * and the residual BETWEEN filter runs on the (small) per-bin
  * candidates. Cost: |facts| + Σ bins(range) rows through a hash join —
  * a shuffle-or-broadcast equi-join like any other, AQE-skew-safe.
  *
  * `binWidth` trades replication (ranges spanning many bins) against
  * candidate precision; pick ≈ the typical range width.
  */
object RangeJoin {

  def binnedRangeJoin(facts: DataFrame, ranges: DataFrame, valueCol: String,
                      loCol: String, hiCol: String, binWidth: Double,
                      joinType: String = "inner"): DataFrame = {
    require(binWidth > 0)
    val f = facts.withColumn("_bin",
      floor(col(valueCol) / binWidth).cast("long"))
    val r = ranges.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor((col(hiCol) - 1e-9) / binWidth).cast("long"))))
    f.join(r, Seq("_bin"), joinType)
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bin")
  }

  /** Reference formulation (nested-loop) — the differential-test
    * partner; only for small `ranges`. */
  def naiveRangeJoin(facts: DataFrame, ranges: DataFrame, valueCol: String,
                     loCol: String, hiCol: String): DataFrame =
    facts.join(broadcast(ranges),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
}
