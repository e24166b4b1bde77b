package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sim.DataQuantizers

/** SemDeDup semantics over the seed-row IVF partition: within-cell
  * duplicate groups collapse to their min-id representative, and the
  * cell boundary genuinely bounds the candidates — a near-dup pair
  * split across cells is NOT collapsed (that is the recall/cost trade
  * the operator's Scaladoc declares, and what makes it Σ|cell|², never
  * n²). Exact-value parity vs DuckDB is the q97 oracle. */
class SemanticDedupSpec extends SparkSpec {

  private val DIM = 8
  private def e(i: Int, s: Float = 1f): Array[Float] =
    Array.tabulate(DIM)(j => if (j == i) s else 0f)
  private def mix(a: Int, wa: Float, b: Int, wb: Float): Array[Float] = {
    val v = new Array[Float](DIM); v(a) = wa; v(b) = wb; v
  }

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v.toSeq) }, 2),
      schema)
  }

  test("within-cell groups collapse; cross-cell near-dups do not pair") {
    // centroids = basis directions at vec_id 0..3 (the seed-row range);
    // scaled copies have cosine exactly 1 to their centroid
    val emb = df(Seq(
      0L -> e(0), 1L -> e(1), 2L -> e(2), 3L -> e(3),
      10L -> e(0, 2f), 11L -> e(0, 3f), 12L -> e(0, 4f), // cell 0 group
      20L -> e(1, 2f),                                   // cell 1 group
      30L -> e(2, 2f),                                   // cell 2 group
      // cos(40, 41) = 1.8/1.81 ≈ 0.994 >= threshold, but 40 lands in
      // cell 0 and 41 in cell 1 — the partition keeps them apart
      40L -> mix(0, 1f, 1, 0.9f),
      41L -> mix(0, 0.9f, 1, 1f)))
    val cents = DataQuantizers.ivfCells(emb, nCentroids = 4, centOffset = 0)
    val asg = DataQuantizers.ivfAssignSeeded(emb, cents)
    val out = DataQuantizers.semanticDedup(asg, emb, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

    val kept = out.filter(_._2).keySet
    // cell groups {0,10,11,12}, {1,20}, {2,30} keep their min id; the
    // lone cell-3 centroid and BOTH cross-cell near-dups survive
    assert(kept == Set(0L, 1L, 2L, 3L, 40L, 41L), s"kept=$kept")
    assert(out.size == 11) // every input row gets a verdict
  }
}
