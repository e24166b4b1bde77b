package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group simple linear regression (closed-form OLS): for each
  * group, slope and intercept of y ~ x from the five sufficient
  * statistics (n, Σx, Σy, Σxy, Σx²).
  *
  * Determinism discipline: x and y enter as DECIMAL(12,2), so all
  * five statistics accumulate exactly (decimal addition is
  * associative — partition order cannot leak into the result), and
  * the final slope/intercept are a FIXED double expression tree over
  * those exact values:
  *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
  *   intercept = ȳ − slope·x̄
  * Every multiply stays within DECIMAL(38,·) by pre-narrowing the
  * sums (18,2)/(24,4), so Spark and a SQL oracle emit identical bits.
  *
  * Scale shape: one hash aggregation on the group key (map-side
  * partial aggregation applies — five decimal accumulators per
  * group), then per-group scalar arithmetic. No second pass, no
  * window, no join.
  */
object GroupOls {

  /** `df` must expose `groupCol` and DECIMAL(12,2)-castable `xCol`,
    * `yCol`. Returns (group, n, slope, intercept) with slope and
    * intercept rounded to 6 decimals. Groups with zero x-variance
    * yield null slope (0/0). */
  def fit(df: DataFrame, groupCol: String, xCol: String,
          yCol: String): DataFrame = {
    val q = col(xCol).cast(DecimalType(12, 2))
    val p = col(yCol).cast(DecimalType(12, 2))
    // width discipline: every product must keep w1+w2 <= 38 so the
    // oracle engine stays on its exact int128 decimal path (DuckDB
    // hard-caps at width 38 and overflows int64 otherwise), and
    // w1+w2+1 <= 38 so Spark never enters precision-loss scale
    // trimming. Hence the narrow(14,2) × wide(23,2) split below.
    val g = df.groupBy(col(groupCol).as("group")).agg(
      count(lit(1)).as("n"),
      sum(q).cast(DecimalType(14, 2)).as("sxn"),
      sum(q).cast(DecimalType(23, 2)).as("sxw"),
      sum(p).cast(DecimalType(23, 2)).as("sy"),
      sum(q * p).cast(DecimalType(29, 4)).as("sxy"),
      sum(q * q).cast(DecimalType(29, 4)).as("sxx"))
    val cnt = col("n").cast(DecimalType(8, 0))
    val num = (cnt * col("sxy") - col("sxn") * col("sy")).cast("double")
    val den = (cnt * col("sxx") - col("sxn") * col("sxw")).cast("double")
    // try_divide: zero x-variance → null slope, matching DuckDB's
    // NULL-on-division-by-zero default (ANSI Spark would throw)
    val slope = try_divide(num, den)
    val xbar = col("sxw").cast("double") / col("n").cast("double")
    val ybar = col("sy").cast("double") / col("n").cast("double")
    g.select(col("group"), col("n"),
      round(slope, 6).as("slope"),
      round(ybar - slope * xbar, 6).as("intercept"))
  }
}
