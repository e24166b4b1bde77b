package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Versioned

/** Streaming SCD Type-2: incrementally replay a per-key-ordered change
  * stream into (a) an append-only HISTORY of closed validity intervals
  * and (b) the open intervals, kept in a [[ParquetStateStore]] — the
  * history-table counterpart of [[Sinks.versionedUpsert]]'s
  * current-state view, and the streaming form of
  * [[Versioned.scd2History]].
  *
  * Differential contract (spec'd): after any prefix of micro-batches,
  * `history ∪ open` row-for-row equals the BATCH
  * `Versioned.scd2History` over the concatenation of those batches.
  *
  * Exactly-once mechanics: each batch's closed intervals land in an
  * idempotent per-batch directory (`batch=<id>`, overwritten verbatim
  * on replay) BEFORE the open-interval state merges through the store's
  * batch-id fence — a crash between the two replays the batch, which
  * rewrites identical history bytes and then applies the state exactly
  * once.
  *
  * Ordering contract: events must arrive per-key ordered across batches
  * (the Debezium/Kafka key-partition guarantee, SURVEY §2.9). Within a
  * batch any order is fine — the per-key sort handles it. A
  * cross-batch late event would need interval splitting, which no
  * incremental SCD2 supports; replay the archive through the batch
  * operator instead.
  *
  * Scale shape: one shuffle of the micro-batch by key (the window),
  * state probes/rewrites touch only the batch's dirty buckets, history
  * writes only the batch's closed rows — per-batch cost is O(batch),
  * never O(history) or O(state). */
object Scd2Stream {

  /** Open-interval state store for `keyCols` rows versioned by
    * `orderCol` — deletes tombstone the key so a later out-of-order
    * replay cannot resurrect it. */
  def openStore(path: String, keyCols: Seq[String],
                orderCol: String, buckets: Int = 32): ParquetStateStore =
    new ParquetStateStore(path, keyCols, Seq(orderCol),
      deletedCol = Some("__deleted"), buckets = buckets)

  /** Apply one micro-batch. `batch` columns: keys ++ payload ++
    * (orderCol, opCol). Public for direct batch-mode use and specs. */
  def applyBatch(batch: DataFrame, batchId: Long, state: ParquetStateStore,
                 historyDir: String, keyCols: Seq[String], orderCol: String,
                 opCol: String, deleteOp: String = "d"): Unit = {
    val spark = batch.sparkSession
    val dataCols = batch.columns.toSeq
    require(keyCols.forall(dataCols.contains) &&
      dataCols.contains(orderCol) && dataCols.contains(opCol),
      s"batch schema ${dataCols.mkString(",")} must carry keys, order, op")

    // batch-level fence FIRST: a replay of a fully-applied batch must
    // not recompute history against post-merge state (it would see its
    // own events as open intervals and emit spurious zero-length rows).
    // History is written before the state merge, so a fenced id always
    // has its history on disk already.
    if (state.lastBatchId(spark).exists(_ >= batchId)) return

    // open intervals re-enter the timeline as pseudo-events at their
    // valid_from; tombstoned keys stay hidden (a fresh event re-opens)
    val open = state.read(spark)
      .filter(_.columns.nonEmpty) // a fresh store may read as zero-column
      .map(_.select(dataCols.map(col): _*))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        batch.schema))
    // (key, order) duplicates collapse to one row: an at-least-once
    // source redelivering an event the state already holds is content-
    // identical per the ordering contract, and keeping both would emit
    // a zero-length interval
    val all = open.unionByName(batch)
      .dropDuplicates(keyCols :+ orderCol)

    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val timeline = all.withColumn("_next", lead(col(orderCol), 1).over(w))

    // closed intervals: every non-delete event with a successor
    val closed = timeline
      .where(col(opCol) =!= deleteOp && col("_next").isNotNull)
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", col("_next"))
      .drop("_next")
    closed.write.mode("overwrite").parquet(s"$historyDir/batch=$batchId")

    // new open state: the last event per key — deletes become
    // tombstones, survivors carry their own orderCol as valid_from
    val last = Versioned.latestByKey(all, keyCols, Seq(col(orderCol)))
      .withColumn("__deleted", col(opCol) === deleteOp)
    state.mergeOnce(last, batchId)
    ()
  }

  /** The streaming sink: foreachBatch over [[applyBatch]]. */
  def sink(changes: DataFrame, state: ParquetStateStore, historyDir: String,
           keyCols: Seq[String], orderCol: String, opCol: String,
           checkpoint: String, deleteOp: String = "d",
           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, state, historyDir, keyCols, orderCol,
          opCol, deleteOp)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** All closed intervals (empty frame with no schema if none yet). */
  def readHistory(spark: SparkSession, historyDir: String): Option[DataFrame] =
    scala.util.Try(spark.read.parquet(historyDir)).toOption

  /** The full SCD2 view: closed history plus open intervals
    * (`valid_to` null, `is_current` true). */
  def fullHistory(spark: SparkSession, state: ParquetStateStore,
                  historyDir: String, orderCol: String): Option[DataFrame] = {
    val openIv = state.read(spark).map { df =>
      df.withColumn("valid_from", col(orderCol))
        .withColumn("valid_to",
          lit(null).cast(df.schema(orderCol).dataType))
        .withColumn("is_current", lit(true))
    }
    val closedIv = readHistory(spark, historyDir)
      .map(_.drop("batch").withColumn("is_current", lit(false)))
    (closedIv, openIv) match {
      case (Some(c), Some(o)) => Some(c.unionByName(o, allowMissingColumns = true))
      case (c, o) => c.orElse(o)
    }
  }
}
