package graft.model

import org.apache.spark.sql.types._

/** Debezium change-event envelope schemas.
  *
  * Shape taken from the reference's golden capture
  * (`basic_example/value.json:760-842`, `key.json:1-18`): every change
  * event is `{schema, payload:{before, after, source, op, ts_ms,
  * transaction}}`; the Kafka key is a PK struct. The reference's
  * ClickHouse layer only ever addresses `payload.*`
  * (`basic_example/clickhouse.sql:58-67`), so the self-describing
  * `schema` half is carried opaquely here too.
  */
object Debezium {

  /** `payload.source` block — `value.json:825-838`. */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),     // capture time: the upsert version column
    StructField("snapshot", StringType), // "true"|"last"|"false"|"incremental"|"first"
    StructField("db", StringType),
    StructField("sequence", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType),
    StructField("xmin", LongType)))

  /** `payload.transaction` block (`provide.transaction.metadata=true`,
    * `abcsvb-connector-secure.json:50`; `value.json:732-754`). */
  val txnSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("total_order", LongType),
    StructField("data_collection_order", LongType)))

  /** Envelope payload for a table whose row shape is `rowSchema`. */
  def payloadSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema),
    StructField("after", rowSchema),
    StructField("source", sourceSchema),
    StructField("op", StringType),      // "r"|"c"|"u"|"d"  value.json:839
    StructField("ts_ms", LongType),
    StructField("transaction", txnSchema)))

  /** Full wire value when `schemas.enable=true` (JsonConverter default):
    * `{schema: <opaque>, payload: <envelope>}`. The `schema` half is
    * typed as String-less opaque struct we never parse — we only need
    * `payload` (mirrors the reference ignoring it). */
  def wrappedSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("payload", payloadSchema(rowSchema))))

  /** Kafka key: `{payload: {<pk fields>}}` — `key.json:15-17`. */
  def keySchema(pkSchema: StructType): StructType = StructType(Seq(
    StructField("payload", pkSchema)))

  // ---- Reference table row schemas (strings-first, as landed by the
  // ---- reference's L2 layer `clickhouse.sql:40-50`; typed casts happen
  // ---- in the usable-view layer `clickhouse.sql:70-82`).

  /** `products` — `basic_example/init_postgresql_data.sql:11-20`.
    * NUMERIC arrives as string (`decimal.handling.mode=string`,
    * `debezium-pg-connector.json:19`); TIMESTAMPTZ as ISO string with
    * trailing `Z`. */
  val productsRow: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("description", StringType),
    StructField("price", StringType),          // NUMERIC(10,2) as string
    StructField("stock_quantity", IntegerType),
    StructField("created_at", StringType),     // ISO with trailing Z
    StructField("updated_at", StringType)))

  /** `customers` — `init_postgresql_data.sql:23-35`. */
  val customersRow: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("phone_number", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip_code", StringType),
    StructField("country", StringType),
    StructField("registered_at", StringType)))

  /** `transactions` — `init_postgresql_data.sql:38-52`. */
  val transactionsRow: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("transaction_uuid", StringType),
    StructField("customer_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("quantity", IntegerType),
    StructField("unit_price", StringType),
    StructField("discount_amount", StringType),
    StructField("total_amount", StringType),
    StructField("transaction_date", StringType),
    StructField("status", StringType),
    StructField("payment_method", StringType)))

  /** `transaction_details` — high-volume scenario,
    * `large_dbtable_example/init_postgresql_data_scenario2.sql:52-61`. */
  val transactionDetailsRow: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("transaction_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("quantity", IntegerType),
    StructField("unit_price", StringType),
    StructField("line_total", StringType),
    StructField("detail_date", StringType)))
}
