package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side row constraints and idempotent-insert semantics.
  *
  * The reference declares CHECK constraints in Postgres DDL
  * (`init_postgresql_data.sql:43-45`: quantity > 0, unit_price >= 0,
  * discount_amount >= 0 — F4) and idempotent inserts via
  * `ON CONFLICT (id) DO NOTHING` (`init_postgresql_data.sql:89,103` —
  * F5). In the engine these become write-path operators: a constraint
  * split (valid/reject channels — the error-channel shape of U6) and a
  * first-writer-wins insert.
  */
object Constraints {

  /** Split a frame into (valid, rejected) on a conjunction of CHECK
    * predicates. One pass each; both are lazily planned so callers that
    * only consume `valid` never pay for the reject channel. */
  def check(df: DataFrame, checks: Map[String, Column]): (DataFrame, DataFrame) = {
    val all = checks.values.reduce(_ && _)
    val failed = checks.map { case (name, c) =>
      when(!coalesce(c, lit(false)), name)
    }.toSeq
    val valid = df.where(coalesce(all, lit(false)))
    val rejected = df.where(!coalesce(all, lit(false)))
      .withColumn("__violations",
        array_compact(array(failed: _*)))
    (valid, rejected)
  }

  /** ON CONFLICT (keys) DO NOTHING: rows whose key already exists in
    * `existing` are dropped; first writer wins. Also dedups the batch
    * itself on the key (min tiebreak via dropDuplicates is
    * nondeterministic, so callers needing determinism pre-sort or use
    * Versioned.latestByKey with an inverted version). */
  def insertIfAbsent(existing: DataFrame, batch: DataFrame,
                     keys: Seq[String]): DataFrame =
    batch
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
