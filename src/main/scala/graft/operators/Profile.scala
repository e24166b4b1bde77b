package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the `ANALYZE TABLE` / data-observability pass a
  * landing layer runs after ingest: per column, null count, exact
  * distinct count, and a numeric min/max envelope (numerics as double,
  * timestamps as epoch micros; other types profile nulls/distincts
  * only, sidestepping cross-engine string-formatting drift).
  *
  * Scale shape, two modes:
  *   - `exact = true`: one branch PER COLUMN, each a pruned
  *     single-column scan + aggregate. Columnar formats charge IO per
  *     column read, so k narrow scans cost the same bytes as one wide
  *     scan — whereas the single-`agg` multi-distinct shape plans
  *     through Expand, multiplying ROWS by the column count before the
  *     exchange (measured 1.7s vs 0.23s on a 6-column 150k-row table).
  *   - `exact = false` (the 100 TB default): one scan, all columns'
  *     `approx_count_distinct` + envelopes in a single agg — no
  *     Expand, no rescan. */
object Profile {

  private def numeric(f: StructField): Option[org.apache.spark.sql.Column] =
    f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      // NTZ (parquet without the UTC flag) casts through LTZ — identical
      // micros in a UTC session, and what DuckDB's epoch_us() reports
      case _: TimestampType | _: TimestampNTZType =>
        Some(unix_micros(col(f.name).cast(TimestampType)).cast("double"))
      case _ => None
    }

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    if (exact) {
      fields.map { f =>
        val c = col(f.name)
        df.select(c)
          .agg(
            sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(c).as("n_distinct"),
            numeric(f).map(min).getOrElse(max(lit(null).cast("double")))
              .as("min_val"),
            numeric(f).map(max).getOrElse(max(lit(null).cast("double")))
              .as("max_val"))
          .select(lit(f.name).as("col_name"), col("n_nulls"),
            col("n_distinct"), col("min_val"), col("max_val"))
      }.reduce(_ unionByName _)
    } else {
      val aggs = fields.flatMap { f =>
        val c = col(f.name)
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}#nulls"),
          approx_count_distinct(c).as(s"${f.name}#nd"),
          numeric(f).map(min).getOrElse(max(lit(null).cast("double")))
            .as(s"${f.name}#min"),
          numeric(f).map(max).getOrElse(max(lit(null).cast("double")))
            .as(s"${f.name}#max"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = fields.map(f =>
        s"'${f.name}', `${f.name}#nulls`, `${f.name}#nd`, " +
          s"`${f.name}#min`, `${f.name}#max`").mkString(", ")
      one.selectExpr(s"stack(${fields.length}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_val, max_val)")
    }
  }

  /** DuckDB oracle for [[profile]] over `table`: one UNION ALL branch
    * per column. `numericCols` maps profiled columns to the SQL
    * expression providing their double envelope (None = non-numeric). */
  def profileSql(table: String,
                 cols: Seq[(String, Option[String])]): String =
    cols.map { case (name, num) =>
      val (mn, mx) = num match {
        case Some(e) => (s"CAST(MIN($e) AS DOUBLE)", s"CAST(MAX($e) AS DOUBLE)")
        case None => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      }
      s"""SELECT '$name' AS col_name,
         |  CAST(SUM(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $name) AS BIGINT) AS n_distinct,
         |  $mn AS min_val, $mx AS max_val
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
}
