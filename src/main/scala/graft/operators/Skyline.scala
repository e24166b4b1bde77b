package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — rows not dominated on a
  * (minimize x, maximize y) pair: row r survives iff no other row has
  * x' <= x AND y' >= y with at least one inequality strict (Borzsonyi,
  * Kossmann & Stocker, ICDE 2001). Duplicated (x, y) points all
  * survive together.
  *
  * Instead of the O(n²) NOT-EXISTS self-join, the frontier is read off
  * two monotone aggregates:
  *   - pmax(x)  = max y among rows at exactly x   → kills same-x
  *     dominators (need y = pmax(x));
  *   - rmax(x)  = max pmax over all x' < x        → kills cheaper
  *     dominators (need y > rmax(x)).
  *
  * Scale shape: one hash aggregation by x (shuffle on x), then the
  * running max runs over the *per-x* table — bounded by the number of
  * distinct x values, orders of magnitude smaller than the data (the
  * testdata price grid caps at 1000 rows) — so the single-partition
  * window is a deliberate, bounded choice, and the verdict joins back
  * to the full table as a broadcast. No step touches n² pairs.
  */
object Skyline {

  /** Skyline of `df` minimizing `xCol` and maximizing `yCol`; returns
    * the input rows (all columns) that lie on the frontier. */
  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__pmax"))
    // per-x table is small (distinct x); ROWS frame is correct because
    // there is exactly one row per x value
    val w = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__rmax", max(col("__pmax")).over(w))
      .where(col("__rmax").isNull || col("__pmax") > col("__rmax"))
    df.join(broadcast(frontier),
        df(xCol) === frontier("__x") && df(yCol) === frontier("__pmax"))
      .drop("__x", "__pmax", "__rmax")
  }

  /** DuckDB mirror of [[pareto2d]] as a CTE chain over `srcSql`
    * (must expose xCol and yCol); yields the frontier rows with the
    * columns of `selectCols`. */
  def paretoSql(srcSql: String, xCol: String, yCol: String,
                selectCols: String): String =
    s"""WITH src AS ($srcSql),
       |perx AS (
       |  SELECT $xCol AS x, MAX($yCol) AS pmax FROM src GROUP BY 1
       |), fr AS (
       |  SELECT x, pmax,
       |    MAX(pmax) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rmax
       |  FROM perx
       |)
       |SELECT $selectCols
       |FROM src JOIN fr ON src.$xCol = fr.x AND src.$yCol = fr.pmax
       |WHERE fr.rmax IS NULL OR fr.pmax > fr.rmax""".stripMargin
}
