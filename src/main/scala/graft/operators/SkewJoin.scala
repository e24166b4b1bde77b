package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-salting for hash joins — the fallback when AQE's runtime
  * skew-join split is unavailable (non-shuffle-join plans, or a hot key
  * so dominant that even split partitions overwhelm a task).
  *
  * `saltedJoin(fact, dim, key, salt = S)`:
  *  - fact side gets a deterministic salt in [0, S) derived from
  *    non-key columns' hash (spreads one hot key over S partitions),
  *  - dim side is replicated S× (one copy per salt value),
  *  - the join key becomes (key, salt) — same pairs, S-way spread.
  *
  * Cost model: dim side grows S×, so use for fact⋈dim with a modest
  * dim; the fact side — the skewed, huge one — never replicates.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt >= 1)
    // Right/full outer are unsupported: the dim side is replicated
    // `salt`×, so an unmatched dim row would null-extend once per copy.
    // Left-family types are safe — each fact row carries exactly one
    // salt value.
    val jt = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti").contains(jt),
      s"saltedJoin supports inner/left/semi/anti, not $joinType " +
        "(the replicated dim side cannot null-extend)")
    val factCols = fact.columns
    val nonKey = factCols.filterNot(_ == key).map(col).toIndexedSeq
    // Any salt value joins correctly (the dim carries every value); the
    // non-key hash just spreads a hot key deterministically. A key-only
    // fact falls back to a row-id spread — nondeterministic across
    // retries, which is fine: the salt only picks WHICH dim copy.
    val saltSrc =
      if (nonKey.nonEmpty) xxhash64(nonKey: _*)
      else xxhash64(monotonically_increasing_id())
    val salted = fact.withColumn("__salt",
      pmod(saltSrc, lit(salt.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
