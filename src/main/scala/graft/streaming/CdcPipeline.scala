package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{DecodeOptions, DeletePolicy, EnvelopeDecode}
import graft.sources.CdcSource

/** Per-table CDC pipeline configuration — the engine-side rendering of
  * one Debezium connector entry + its ClickHouse landing DDL
  * (`basic_example/debezium-pg-connector.json` +
  * `basic_example/clickhouse.sql`): a user of the reference maps each
  * captured table's config onto one of these.
  *
  * @param table        `<schema>.<table>` as in `table.include.list`
  * @param topicPrefix  `topic.prefix`
  * @param rowSchema    landed row shape (strings-first, like the
  *                     reference's L2 layer)
  * @param keys         business key (`ORDER BY` of ReplacingMergeTree)
  * @param deletePolicy delete/tombstone handling (F1/U1 matrix)
  * @param maskFields   `MaskField$Value` columns (U2)
  * @param landRaw      also keep the L1 raw archive (the high-volume
  *                     scenario keeps ONLY this —
  *                     `start-high-volume-cdc.sh:77-81`)
  * @param landTyped    maintain the L2 typed current-state store
  */
final case class TableCdcConfig(
    table: String,
    topicPrefix: String,
    rowSchema: StructType,
    keys: Seq[String],
    deletePolicy: DeletePolicy = DeletePolicy.Apply,
    maskFields: Seq[String] = Nil,
    landRaw: Boolean = true,
    landTyped: Boolean = true) {
  def topic: String = {
    val Array(sch, tbl) = table.split('.')
    CdcSource.topicFor(topicPrefix, sch, tbl)
  }
  def decodeOptions: DecodeOptions =
    DecodeOptions(deletePolicy = deletePolicy, maskFields = maskFields)
}

/** Builds and starts the full per-table flow from one config: raw
  * envelope stream → (L1 raw archive) + (decode → L2 versioned
  * upsert), registered idempotently — the whole
  * `clickhouse.sql` MV stack as one call. */
object CdcPipeline {

  final case class Running(
      config: TableCdcConfig,
      raw: Option[StreamingQuery],
      typed: Option[StreamingQuery],
      store: Option[ParquetStateStore])

  /** @param envelopes raw (value: String) stream — from
    *   [[CdcSource.kafkaStream]] or [[CdcSource.fileStream]]
    * @param baseDir   layout root: `<base>/<table>/raw`, `/state`,
    *   `/checkpoints` */
  def start(spark: SparkSession, config: TableCdcConfig,
            envelopes: DataFrame, baseDir: String,
            registry: PipelineRegistry,
            trigger: Trigger = Trigger.AvailableNow()): Running = {
    val dir = s"$baseDir/${config.table.replace('.', '_')}"

    val raw =
      if (config.landRaw)
        Some(registry.startIfAbsent(s"${config.topic}.raw") {
          Sinks.rawArchive(envelopes, s"$dir/raw", s"$dir/checkpoints/raw",
            trigger)
        })
      else None

    val (typed, store) =
      if (config.landTyped) {
        // Drop policy strips deletes before unwrap, so no flag column
        val deletedCol =
          if (config.deletePolicy == DeletePolicy.Drop) None
          else Some("__deleted")
        val st = new ParquetStateStore(s"$dir/state", config.keys,
          Seq("__ts_ms", "__lsn"), deletedCol)
        val changes = EnvelopeDecode.changes(envelopes, config.rowSchema,
          config.decodeOptions)
        val q = registry.startIfAbsent(s"${config.topic}.typed") {
          Sinks.versionedUpsert(changes, st, s"$dir/checkpoints/typed", trigger)
        }
        (Some(q), Some(st))
      } else (None, None)

    Running(config, raw, typed, store)
  }
}
