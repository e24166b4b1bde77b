package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Additive keyed state — the `SummingMergeTree` analog: rows sharing
  * a key collapse by SUMMING `sumCols` instead of last-writer-wins,
  * giving an incrementally-maintained aggregate table (running totals
  * per key) with the same hash-bucketed dirty-bucket merge I/O as
  * [[ParquetStateStore]].
  *
  * Unlike LWW, additive merge is NOT replay-idempotent — a re-applied
  * batch double-counts — so all streaming writes must go through
  * [[ParquetStateStore.mergeOnce]] with the micro-batch id
  * ([[Sinks.aggregatingUpsert]] does): the id is fenced inside the
  * atomically-swapped manifest, upgrading foreachBatch's at-least-once
  * redelivery to exactly-once state effects. This is precisely the
  * discipline ClickHouse cannot offer on a plain Kafka →
  * SummingMergeTree path (it relies on at-least-once + background
  * merges), and a place where the Spark rendering is strictly
  * stronger. */
class SummingStateStore(
    path: String,
    keys: Seq[String],
    val sumCols: Seq[String],
    buckets: Int = 32)
  extends ParquetStateStore(path, keys, versionCols = Nil,
    deletedCol = None, buckets = buckets) {
  require(sumCols.nonEmpty, "sumCols must be non-empty")

  override protected def collapse(unioned: DataFrame): DataFrame =
    unioned.groupBy((keys :+ "__gbucket").map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
}

/** Mergeable-sketch keyed state — the `AggregatingMergeTree` +
  * `uniqState`/`uniqMerge` analog: `sketchCols` hold mergeable sketch
  * binaries that collapse by their union aggregate, so the store
  * maintains per-key sketch state incrementally — merge I/O stays
  * O(dirty buckets × sketch bytes) no matter how many raw rows fed
  * each sketch. The default merge is `hll_union_agg` (distinct-count
  * state, read with `hll_sketch_estimate`); `mergeAgg` selects another
  * union per column — e.g. [[graft.functions.QuantileSketch.merge]]
  * for DDSketch quantile state (the `quantileState`/`quantileMerge`
  * pair), read with `dd_sketch_quantile`. Same replay caveat as
  * summing: sketch-union of a replayed batch is idempotent for the
  * SAME items but the fenced [[ParquetStateStore.mergeOnce]] path is
  * still the contract (ids must advance), keeping the MergeTree
  * disciplines uniform. */
class SketchStateStore(
    path: String,
    keys: Seq[String],
    val sketchCols: Seq[String],
    buckets: Int = 32,
    mergeAgg: String => (Column => Column) = _ => hll_union_agg)
  extends ParquetStateStore(path, keys, versionCols = Nil,
    deletedCol = None, buckets = buckets) {
  require(sketchCols.nonEmpty, "sketchCols must be non-empty")

  override protected def collapse(unioned: DataFrame): DataFrame =
    unioned.groupBy((keys :+ "__gbucket").map(col): _*)
      .agg(mergeAgg(sketchCols.head)(col(sketchCols.head)).as(sketchCols.head),
        sketchCols.tail.map(c => mergeAgg(c)(col(c)).as(c)): _*)
}
