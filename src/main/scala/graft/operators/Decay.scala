package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-decay weighting — the `exponentialTimeDecayedAvg` analog. */
object Decay {

  /** Time-decayed weighted average:
    * `Σ v·e^((t−t_ref)/τ) / Σ e^((t−t_ref)/τ)` with `t_ref` each
    * group's latest event — recent observations dominate, a weight
    * halves every `τ·ln2` seconds.
    *
    * This is the PERMUTATION-INVARIANT decay form (a ratio of two
    * plain sums over the event set — algebraically identical to the
    * sequential EMA recurrence evaluated at `t_ref` for this weight
    * family), so it needs no ordered scan and no custom aggregate:
    * one aggregation for the per-group reference time, one for the
    * two sums, both partial-aggregated before their exchange on the
    * same key — and any engine reproduces it up to float rounding,
    * which is what lets q93 hash-match the DuckDB oracle at a fixed
    * output scale.
    *
    * Input: `tsSecCol` epoch seconds (castable to double), `valueCol`
    * numeric. Output: groupCols :+ `decayed_avg`. */
  def timeDecayedAvg(df: DataFrame, tsSecCol: String, valueCol: String,
                     groupCols: Seq[String], tauSec: Double): DataFrame = {
    require(tauSec > 0, s"tauSec must be positive, got $tauSec")
    val g = groupCols.map(col)
    val ref = df.groupBy(g: _*)
      .agg(max(col(tsSecCol)).cast("double").as("__tref"))
    df.join(ref, groupCols)
      .withColumn("__w",
        exp((col(tsSecCol).cast("double") - col("__tref")) / tauSec))
      .groupBy(g: _*)
      .agg((sum(col(valueCol).cast("double") * col("__w")) / sum(col("__w")))
        .as("decayed_avg"))
  }
}
