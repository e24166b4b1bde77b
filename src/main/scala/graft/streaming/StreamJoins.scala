package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the enrichment shape a streaming
  * training pipeline needs when two feeds must be correlated in event
  * time (impressions↔conversions, docs↔labels, envelope↔ack). The
  * reference stack routes one stream into MergeTree and joins at query
  * time; Spark can join the streams directly with bounded state, which
  * is the 100 TB-friendly form: each side's buffer is capped by
  * `watermark` + the interval width, so state is O(in-flight window),
  * not O(history), regardless of total throughput. */
object StreamJoins {

  /** Event-time interval join: rows pair when keys match and
    * `rightTs ∈ [leftTs + lowerSec, leftTs + upperSec]`. Both sides
    * MUST carry watermarks already (the caller owns lateness policy);
    * the range condition is what lets Spark expire state — an
    * unconstrained stream-stream join would buffer forever.
    *
    * Column names must be disjoint apart from `key`. Inner joins only:
    * outer stream-stream joins emit nulls on watermark expiry, a
    * different contract (add when needed). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long): DataFrame = {
    require(lowerSec <= upperSec,
      s"empty interval: [$lowerSec, $upperSec]")
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $upperSec SECONDS"),
      "inner")
      .drop(right(key))
  }
}
