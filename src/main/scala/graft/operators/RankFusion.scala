package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
  * several ranked retrieval lists into one by scoring each document
  * `sum over lists of 1 / (k + rank)`. RRF is the standard way to
  * merge a lexical (BM25) and a dense (ANN) ranking without score
  * calibration — only ranks cross lists, so the two scoring scales
  * never have to be commensurable.
  *
  * Scale shape: the inputs are already *bounded* top-N lists (each
  * produced by a distributed top-k — TakeOrderedAndProject or the
  * bounded-heap TopKByScore aggregate — over the full corpus), so the
  * fusion itself is a union + one hash aggregation over at most
  * `lists.size * N` rows regardless of corpus size. The double sum is
  * order-safe here because each id carries at most one rank per list
  * and two-operand double addition is commutative.
  */
object RankFusion {

  /** Each list: (id: long, rank: int starting at 1). Returns
    * (id, rrf: double) — NOT rounded; callers round for oracles. */
  def rrf(lists: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k >= 0, s"rrf constant must be >= 0, got $k")
    lists
      .map(_.select(col("id"), col("rank")))
      .reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(lit(1.0) / (lit(k) + col("rank"))).as("rrf"))
  }
}
