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
    // Right/full outer are unsupported: an unmatched range row appears
    // once PER overlapped bin after the explode, so null-extension would
    // duplicate it. Left-family types are safe because the fact side
    // computes exactly one bin — the BETWEEN residual lives INSIDE the
    // join condition so a candidate that fails it still null-extends
    // (post-join .where() would silently turn left outer into inner).
    val jt = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti").contains(jt),
      s"binnedRangeJoin supports inner/left/semi/anti, not $joinType " +
        "(use naiveRangeJoin for small right-outer cases)")
    val f = facts.withColumn("_fbin",
      floor(col(valueCol) / binWidth).cast("long"))
    val r = ranges.withColumn("_rbin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor((col(hiCol) - 1e-9) / binWidth).cast("long"))))
    val cond = col("_fbin") === col("_rbin") &&
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol)
    f.join(r, cond, joinType).drop("_fbin", "_rbin")
  }

  /** Reference formulation (nested-loop) — the differential-test
    * partner; only for small `ranges`. */
  def naiveRangeJoin(facts: DataFrame, ranges: DataFrame, valueCol: String,
                     loCol: String, hiCol: String): DataFrame =
    facts.join(broadcast(ranges),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /** Interval × interval OVERLAP join — `[lLo, lHi]` meets `[rLo, rHi]`
    * iff `lLo <= rHi && rLo <= lHi` (inclusive ends) — as an equi-join,
    * with NO post-join dedup: both sides explode to the grid cells
    * their interval spans, candidates meet on the cell, and a pair is
    * emitted ONLY from the cell containing the overlap's start
    * (`greatest(lLo, rLo)`), so each overlapping pair surfaces exactly
    * once no matter how many cells the two intervals share. This is
    * the standard distributed interval join (the one-sided [[
    * binnedRangeJoin]] generalized to two interval sides).
    *
    * Cost: Σ cells(left) + Σ cells(right) rows through one hash
    * equi-join — pick `binWidth` ≈ the typical interval width so the
    * per-side replication factor stays near 2. All four bound columns
    * must be numeric (map dates to epoch days first — a monotone
    * transform preserves overlap). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lLo: String, lHi: String,
                          rLo: String, rHi: String,
                          binWidth: Double): DataFrame = {
    require(binWidth > 0)
    def cells(lo: String, hi: String) = sequence(
      floor(col(lo) / binWidth).cast("long"),
      floor(col(hi) / binWidth).cast("long"))
    val l = left.withColumn("_lcell", explode(cells(lLo, lHi)))
    val r = right.withColumn("_rcell", explode(cells(rLo, rHi)))
    val overlapStartCell =
      floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long")
    l.join(r, col("_lcell") === col("_rcell") &&
        col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("_lcell") === overlapStartCell)
      .drop("_lcell", "_rcell")
  }
}
