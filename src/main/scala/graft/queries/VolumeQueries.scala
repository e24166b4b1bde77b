package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scenario-2 volume parity (BASELINE.md; reference
  * `large_dbtable_example dir`): the high-volume detail stream is landed
  * as a raw L1 archive (typed layer deliberately skipped,
  * `start-high-volume-cdc.sh:77-81`) and the header totals are
  * back-filled from the details (A1, `scenario2:174-179`).
  *
  * `lineitem` plays `transaction_details` (600k rows at sf0.1 ≈ the
  * reference's 1M), `orders` plays `transactions`.
  */
object VolumeQueries {

  /** The detail-stream L1 landing: one JSON message per detail row with
    * Kafka-ish (partition, offset) metadata — T3 projection + F2 guard
    * + S6 ordering columns (`init_clickhouse_raw_tables.sql:28-48`). */
  private def rawArchive(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.loadParallel(s, dir, "lineitem")
    // The payload is rendered with explicit concat + DECIMAL(12,2)
    // formatting rather than to_json: engines disagree on float/JSON
    // text rendering, and a byte-exact payload is what lets the archive
    // accounting (q66) be oracled instead of rows-only. Still plain
    // JSON — q68 parses it back with from_json.
    val dec = (c: org.apache.spark.sql.Column) =>
      c.cast("decimal(12,2)").cast("string")
    li.select(
      concat(lit("{\"transaction_id\":"), col("l_orderkey").cast("string"),
        lit(",\"line_no\":"), col("l_linenumber").cast("string"),
        lit(",\"quantity\":"), dec(col("l_quantity")),
        lit(",\"line_total\":"), dec(col("l_extendedprice")),
        lit("}")).as("value_json"),
      pmod(col("l_orderkey"), lit(8)).cast("int").as("partition_num"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("offset_num"))
      // F2 guard expressed over the INPUTS (the rendered payload is null
      // iff an input is null, and never empty — it carries literal
      // braces): a guard written against value_json gets predicate-
      // pushed below the repartition exchange WITH the whole concat/
      // decimal render substituted into it, so the render would run in
      // the row-group-bound scan stage (3 tasks here) and then again in
      // the projection — measured 4× slower at sf0.1.
      .where(col("l_orderkey").isNotNull && col("l_linenumber").isNotNull &&
        col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
  }

  val all: Seq[Q] = Seq(

    // ---- archive accounting: per-partition counts + offset ranges ----
    Q("q66_volume_archive",
      (s, dir) => rawArchive(s, dir)
        .groupBy("partition_num")
        .agg(count(lit(1)).as("n_messages"),
          min(col("offset_num")).as("min_offset"),
          max(col("offset_num")).as("max_offset"),
          sum(length(col("value_json"))).cast("long").as("payload_bytes"))
        .orderBy("partition_num"),
      // Byte-exact oracle: the payload is deterministic concat-rendered
      // JSON (DECIMAL(12,2) money fields), so DuckDB rebuilds the very
      // same strings and the byte totals match to the digit.
      Some("""SELECT CAST(l_orderkey % 8 AS INTEGER) AS partition_num,
             |  COUNT(*) AS n_messages,
             |  MIN(l_orderkey * 10 + l_linenumber) AS min_offset,
             |  MAX(l_orderkey * 10 + l_linenumber) AS max_offset,
             |  CAST(SUM(LENGTH(
             |    '{"transaction_id":' || CAST(l_orderkey AS VARCHAR)
             |    || ',"line_no":' || CAST(l_linenumber AS VARCHAR)
             |    || ',"quantity":' || CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR)
             |    || ',"line_total":' || CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR)
             |    || '}')) AS BIGINT) AS payload_bytes
             |FROM lineitem
             |GROUP BY l_orderkey % 8
             |ORDER BY partition_num""".stripMargin)),

    // ---- archive accounting, oracle-safe form (no JSON text) ----------
    Q("q67_volume_offsets",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.select(
          pmod(col("l_orderkey"), lit(8)).cast("int").as("partition_num"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("offset_num"))
          .groupBy("partition_num")
          .agg(count(lit(1)).as("n_messages"),
            min(col("offset_num")).as("min_offset"),
            max(col("offset_num")).as("max_offset"))
          .orderBy("partition_num")
      },
      Some("""SELECT CAST(l_orderkey % 8 AS INTEGER) AS partition_num,
             |  COUNT(*) AS n_messages,
             |  MIN(l_orderkey * 10 + l_linenumber) AS min_offset,
             |  MAX(l_orderkey * 10 + l_linenumber) AS max_offset
             |FROM lineitem
             |GROUP BY l_orderkey % 8
             |ORDER BY partition_num""".stripMargin)),

    // ---- A1 back-fill at volume THROUGH the JSON archive: parse the
    // ---- landed messages, aggregate line totals, update headers ------
    Q("q68_volume_backfill",
      (s, dir) => {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("transaction_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("line_total",
            org.apache.spark.sql.types.DoubleType)))
        val details = rawArchive(s, dir)
          .select(from_json(col("value_json"), schema).as("d"))
          .select(col("d.transaction_id"), col("d.line_total"))
        val sums = details.groupBy("transaction_id")
          .agg(sum(col("line_total").cast("decimal(12,2)")).cast("double")
            .as("backfilled_total"))
        Tables.load(s, dir, "orders")
          .join(sums, col("o_orderkey") === col("transaction_id"), "left")
          .select(col("o_orderkey"),
            coalesce(col("backfilled_total"), lit(0.0)).as("backfilled_total"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, COALESCE(t.s, 0.0) AS backfilled_total
             |FROM orders
             |LEFT JOIN (
             |  SELECT l_orderkey,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s
             |  FROM lineitem GROUP BY l_orderkey
             |) t ON o_orderkey = l_orderkey
             |ORDER BY o_orderkey""".stripMargin))
  )
}
