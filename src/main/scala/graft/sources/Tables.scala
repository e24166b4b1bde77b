package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet star-schema loader for the harness testdata
  * (`/root/testdata/sf*` — see TESTDATA.md).
  *
  * Mirrors the reference's "declared schema over landed data" layer
  * (`basic_example/clickhouse.sql:40-52`): schema comes from the files,
  * column pruning + predicate pushdown come from Catalyst for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is parquet TIMESTAMP(NANOS): Spark lands it as Long
    // (spark.sql.legacy.parquet.nanosAsLong=true); truncate ns → µs with
    // integer division — the same truncation DuckDB applies, so oracle
    // comparisons agree to the microsecond.
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
