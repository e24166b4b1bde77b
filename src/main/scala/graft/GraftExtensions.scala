package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Registers the engine's native expressions as SQL functions, so the
  * SQL surface (S9) is as complete as the Column API:
  *
  * {{{
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * spark.sql("SELECT simhash64(split(text, ' ')) FROM docs")
  * }}}
  *
  * Usable both as an extension
  * (`.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.GraftExtensions`) and imperatively via
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name),
          builder))
    }
}

object GraftExtensions {

  private def arg(e: Seq[Expression], i: Int): Expression = e(i)

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def doubleLit(e: Expression, what: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: java.math.BigDecimal, _) =>
      v.doubleValue
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
        if v.isInstanceOf[org.apache.spark.sql.types.Decimal] =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** Coerce numeric arrays (e.g. SQL decimal literals) to
    * array<double>; leave float/double arrays untouched. */
  private def numericVec(e: Expression): Expression = {
    import org.apache.spark.sql.types._
    e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => e
      case ArrayType(_: NumericType, n) =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          e, ArrayType(DoubleType, n))
      case _ => e // let checkInputDataTypes report it
    }
  }

  /** name → expression builder for every engine function. */
  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (e =>
      CosineSimilarity(numericVec(arg(e, 0)), numericVec(arg(e, 1)))),
    "minhash_signature" -> (e => MinHashSignature(arg(e, 0),
      if (e.size > 1) intLit(e(1), "numHashes") else 64,
      if (e.size > 2) longLit(e(2), "seed") else 42L)),
    "simhash64" -> (e => SimHash64(arg(e, 0))),
    "word_shingles" -> (e => WordShingles(arg(e, 0),
      if (e.size > 1) intLit(e(1), "k") else 3)),
    "hyperplane_sign_bits" -> (e => HyperplaneSignBits(arg(e, 0),
      intLit(e(1), "bits"), longLit(e(2), "seed"))),
    "deletion_hashes" -> (e => DeletionHashes(arg(e, 0),
      if (e.size > 1) intLit(e(1), "maxDeletions") else 2)),
    "morton_interleave" -> (e => MortonInterleave(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.LongType))),
    "vector_avg" -> (e =>
      VectorAvg(numericVec(arg(e, 0))).toAggregateExpression()),
    // Cast to the aggregate's native (double, long) exactly as the
    // Column API does — raw children would pass analysis and throw
    // ClassCastException executor-side on e.g. decimal literals.
    "top_k_by" -> (e => TopKByScore(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.LongType),
      intLit(e(2), "k")).toAggregateExpression()),
    // window_funnel(ts, bits, window, steps) — ts/bits are expressions,
    // window/steps must be literals (they parameterize the aggregate)
    "window_funnel" -> (e => WindowFunnel(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.IntegerType),
      longLit(e(2), "window"),
      intLit(e(3), "steps")).toAggregateExpression()),
    // sequence_count(ts, bits, steps) — ClickHouse sequenceCount analog
    "sequence_count" -> (e => SequenceCount(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.IntegerType),
      intLit(e(2), "steps")).toAggregateExpression()),
    // sequence_count_t(ts, bits, steps, gap1, ...) — the (?t<=n) form
    "sequence_count_t" -> (e => SequenceCountTimed(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.IntegerType),
      intLit(e(2), "steps"),
      e.drop(3).map(g => longLit(g, "maxGap"))).toAggregateExpression()),
    "approx_top_k" -> (e => ApproxTopK(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.StringType),
      intLit(e(1), "k"),
      if (e.size > 2) intLit(e(2), "capacity") else 1024)
      .toAggregateExpression()),
    "approx_top_k_weighted" -> (e => ApproxTopKWeighted(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.LongType),
      intLit(e(2), "k"),
      if (e.size > 3) intLit(e(3), "capacity") else 1024)
      .toAggregateExpression()),
    // bloom_filter_build(item, expectedItems, fpp) — mergeable filter
    // binary; probe with bloom_might_contain(filter, item)
    "bloom_filter_build" -> (e => BloomFilterBuild(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.StringType),
      longLit(e(1), "expectedItems"),
      if (e.size > 2) doubleLit(e(2), "fpp") else 0.01)
      .toAggregateExpression()),
    "bloom_might_contain" -> (e => BloomMightContain(
      arg(e, 0),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.StringType))),
    // dd_sketch_agg(x, alpha, maxBuckets) → binary DDSketch;
    // dd_sketch_merge unions sketches; dd_sketch_quantile reads one
    "dd_sketch_agg" -> (e => DDSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.DoubleType),
      if (e.size > 1) doubleLit(e(1), "alpha") else 0.01,
      if (e.size > 2) intLit(e(2), "maxBuckets") else 4096)
      .toAggregateExpression()),
    "dd_sketch_merge" -> (e =>
      DDSketchMerge(arg(e, 0)).toAggregateExpression()),
    "dd_sketch_quantile" -> (e => DDSketchQuantile(
      arg(e, 0),
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 1), org.apache.spark.sql.types.DoubleType))),
    // theta sketch: distinct counting with set ops (uniqTheta analog)
    "theta_sketch_agg" -> (e => ThetaSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(
        arg(e, 0), org.apache.spark.sql.types.StringType),
      if (e.size > 1) intLit(e(1), "k") else 4096)
      .toAggregateExpression()),
    "theta_sketch_union" -> (e =>
      ThetaSketchUnion(arg(e, 0)).toAggregateExpression()),
    "theta_estimate" -> (e => ThetaEstimate(arg(e, 0))),
    "theta_intersect" -> (e => ThetaSetEstimate(arg(e, 0), arg(e, 1), 0)),
    "theta_a_not_b" -> (e => ThetaSetEstimate(arg(e, 0), arg(e, 1), 1)),
    "theta_union_estimate" -> (e => ThetaSetEstimate(arg(e, 0), arg(e, 1), 2)))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
