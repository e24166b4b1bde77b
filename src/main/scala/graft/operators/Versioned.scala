package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned-upsert / current-state operators — the Spark rendering of
  * ClickHouse `ReplacingMergeTree(version) ORDER BY key` + `FINAL`
  * (`basic_example/clickhouse.sql:40-52,81-82`).
  *
  * Two equivalent formulations are provided; both are exact
  * last-writer-wins by (version, tiebreak):
  *
  *  - [[latestByKey]] — `groupBy(key).agg(max_by(struct(*), version))`.
  *    Preferred at scale: hash aggregate with map-side partial
  *    aggregation, so each executor pre-collapses its partitions before
  *    the single shuffle. With K distinct keys and N >> K change rows,
  *    only ~K rows per executor cross the wire.
  *  - [[latestByKeyWindow]] — `row_number() over (partition by key order
  *    by version desc) = 1`. Shuffles *all* N rows then sorts each
  *    partition; kept because it is the standard formulation and the
  *    differential-test partner for the aggregate form.
  */
object Versioned {

  /** Current state: one row per key, the row with the max version.
    * `tiebreak` makes the result deterministic when versions collide
    * (the reference's version-less `ReplacingMergeTree()` keeps an
    * arbitrary "last inserted" row — `init_transpassport.sql:42-61`; we
    * are strictly stronger, SURVEY §7 risk 1). */
  def latestByKey(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val dataCols = df.columns.filterNot(keys.contains).toSeq
    val ord = struct(version: _*)
    val picked = df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(dataCols.map(col): _*), ord).as("_latest"))
    dataCols.foldLeft(picked)((d, c) => d.withColumn(c, col(s"_latest.$c")))
      .drop("_latest")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Window formulation of [[latestByKey]] (differential-test partner). */
  def latestByKeyWindow(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Apply a change-batch onto a current-state frame: union + collapse,
    * then drop rows whose latest event is a delete (DeletePolicy.Apply).
    * `deletedCol` must exist in both frames (e.g. `__deleted`). */
  def applyChanges(state: DataFrame, batch: DataFrame, keys: Seq[String],
                   version: Seq[Column], deletedCol: String = "__deleted"): DataFrame = {
    val merged = latestByKey(state.unionByName(batch), keys, version)
    if (merged.columns.contains(deletedCol))
      merged.where(!coalesce(col(deletedCol), lit(false)))
    else merged
  }

  /** Pure-streaming keyed current state via `mapGroupsWithState`: one
    * (version, row) per key held in executor state, updated
    * last-writer-wins per micro-batch, emitted in update mode.
    *
    * Offered for completeness of the W1 surface; production guidance
    * (SURVEY §7 risk 5) stands: PK-keyed state is unbounded by design,
    * so for full-table CDC the state belongs in the sink table
    * ([[graft.streaming.ParquetStateStore]] / Delta MERGE), not
    * executor memory. This variant fits bounded key spaces (per-device,
    * per-session state).
    *
    * @param version  orders rows; larger wins (ties: keep existing)
    */
  def streamingLatestByKey[K: org.apache.spark.sql.Encoder,
                           V: org.apache.spark.sql.Encoder](
      ds: org.apache.spark.sql.Dataset[V], key: V => K, version: V => Long)(
      implicit tupleEnc: org.apache.spark.sql.Encoder[(K, V)])
      : org.apache.spark.sql.Dataset[(K, V)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ds.groupByKey(key)
      .mapGroupsWithState[V, (K, V)](GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[V], state: GroupState[V]) =>
          var best = state.getOption
          rows.foreach { r =>
            if (best.forall(b => version(r) > version(b))) best = Some(r)
          }
          state.update(best.get)
          (k, best.get)
      }
  }

  /** A1 (`scenario2:174-179`): correlated scalar-subquery SUM driving an
    * UPDATE — decorrelated Spark-first as partial-agg + broadcast-back
    * merge. `details.groupBy(fk).sum` reduces before the join, so the
    * join input is |headers| + |distinct fk|, not |details|. */
  def backfillTotal(headers: DataFrame, details: DataFrame,
                    headerKey: String, detailFk: String,
                    amount: Column, target: String): DataFrame = {
    val sums = details.groupBy(col(detailFk).as(headerKey))
      .agg(sum(amount).as("_backfill_total"))
    headers.join(sums, Seq(headerKey), "left")
      .withColumn(target, coalesce(col("_backfill_total"), lit(0).cast("double")))
      .drop("_backfill_total")
  }

  /** SCD Type-2 history from a change stream (Kimball's slowly-changing
    * dimension; the history-table counterpart of [[latestByKey]]'s
    * current-state view): every non-delete change version becomes a
    * validity interval `[valid_from, valid_to)`, a successor version
    * closes its predecessor, and a delete closes the last interval
    * without opening a new one. `is_current` marks the open interval —
    * a hard-deleted key ends with no current row.
    *
    * `lead` is computed over ALL events (deletes included) BEFORE the
    * delete rows are dropped, which is what lets a delete close its
    * predecessor without surviving as a row.
    *
    * Scale shape: one shuffle on the key, per-key sort by the version
    * columns inside each partition (per-key event counts are bounded by
    * churn, not corpus size). Equivalent to the reference replaying its
    * topic into a history table instead of ReplacingMergeTree. */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String], opCol: String,
                  deleteOp: String = "d"): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val validFrom = col(orderCols.head)
    changes
      .withColumn("_next_from", lead(validFrom, 1).over(w))
      .where(col(opCol) =!= deleteOp)
      .withColumn("valid_from", validFrom)
      .withColumn("valid_to", col("_next_from"))
      .withColumn("is_current", col("_next_from").isNull)
      .drop("_next_from")
  }
}
