package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Change-stream source facade (S1/S2): where the envelopes come from.
  *
  * The reference consumes topics named `<topic.prefix>.<schema>.<table>`
  * (`basic_example/clickhouse.sql:17`, `debezium-pg-connector.json:7`);
  * [[topicFor]] / [[parseTopic]] implement that routing contract and
  * [[subscribePattern]] builds the regex a Kafka consumer subscribes
  * with for a whole capture list (`table.include.list`,
  * `abcsvb-connector-secure.json:57`).
  */
object CdcSource {

  final case class TopicRef(prefix: String, schema: String, table: String)

  def topicFor(prefix: String, schema: String, table: String): String =
    s"$prefix.$schema.$table"

  def parseTopic(topic: String): Option[TopicRef] =
    topic.split('.') match {
      case Array(p, s, t) => Some(TopicRef(p, s, t))
      case parts if parts.length > 3 =>
        // schema/table cannot contain '.', prefix may
        Some(TopicRef(parts.dropRight(2).mkString("."),
          parts(parts.length - 2), parts(parts.length - 1)))
      case _ => None
    }

  /** Subscribe-pattern regex for `prefix` and an include list of
    * `schema.table` entries (empty = all tables under the prefix). */
  def subscribePattern(prefix: String, includes: Seq[String] = Nil): String =
    if (includes.isEmpty) java.util.regex.Pattern.quote(prefix) + "\\..+\\..+"
    else includes.map(i => java.util.regex.Pattern.quote(s"$prefix.$i"))
      .mkString("|")

  /** Kafka stream of raw envelope values (S2). Requires the
    * spark-sql-kafka connector on the classpath (not bundled in this
    * build environment — the file variant below is the hermetic
    * equivalent used by the test harness; both yield the same
    * (key, value, topic) string frame). */
  def kafkaStream(spark: SparkSession, bootstrap: String,
                  pattern: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribePattern", pattern)
      .load()
      .selectExpr("CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value", "topic",
        "partition", "offset")

  /** File-backed stream of raw envelope values — the hermetic S2 stand-
    * in (one JSON object per line, `value` column). */
  def fileStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .json(path)

  /** JDBC initial snapshot (S1, `snapshot.mode=initial`,
    * `basic_example/debezium-pg-connector.json:3-20`): the relational
    * image a migrating deployment lands at version 0 before the change
    * stream upserts on top (see the StreamingSpec S1 analog for the
    * stamp-then-merge pattern against [[graft.streaming.ParquetStateStore]]).
    *
    * `partitionColumn` + bounds split the snapshot into `numPartitions`
    * parallel range reads — mandatory at scale; an unpartitioned JDBC
    * read funnels the whole table through one task. Requires the
    * database's JDBC driver jar on the classpath (not bundled in this
    * build environment — the parquet snapshot in the S1 spec is the
    * hermetic equivalent; schema resolution happens eagerly at `load()`,
    * so without a driver this fails fast with "No suitable driver"). */
  def jdbcSnapshot(spark: SparkSession, url: String, table: String,
                   props: Map[String, String] = Map.empty,
                   partitionColumn: Option[String] = None,
                   lowerBound: Long = 0L, upperBound: Long = 0L,
                   numPartitions: Int = 32): DataFrame = {
    val base = props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (b, (k, v)) => b.option(k, v)
    }
    (partitionColumn match {
      case Some(c) => base.option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
      case None => base
    }).load()
  }
}
