package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Token-distribution drift between two corpus slices — the data-
  * monitoring step of an LLM pipeline: compare the unigram
  * distribution of slice A vs slice B per language (new crawl vs
  * reference corpus, train vs validation, yesterday vs today) via
  * add-one-smoothed KL divergence in both directions.
  *
  * Exactness discipline: each term's KL contribution is a double
  * computed by the IDENTICAL expression in Spark and DuckDB
  * (`p·ln(p/q)` over counts cast to double), then rounded to 9
  * decimals and accumulated as DECIMAL(38,9) — decimal addition is
  * associative, so the corpus-level sum is independent of partition
  * order and bit-identical across engines (the q82 "ln grain"
  * discipline plus the q104 decimal-accumulation discipline).
  *
  * Scale shape: one shuffle on (lang, term) for the count table, one
  * tiny per-lang aggregate broadcast back, one final per-lang
  * reduce. Both distributions come out of a single corpus pass
  * (conditional aggregation on the slice flag), never two scans.
  */
object Drift {

  /** Per-lang drift between `sideExpr = 0` and `sideExpr = 1` rows:
    * `lang, vocab_size, n_tokens_a, n_tokens_b, kl_ab, kl_ba`.
    * Smoothing: p(term) = (c + 1) / (total + |joint vocab|), a proper
    * distribution over the union vocabulary, so KL ≥ 0 (Gibbs). */
  def unigramDrift(docs: DataFrame, sideExpr: Column): DataFrame = {
    val toks = docs.select(
      col("lang"), sideExpr.cast("int").as("side"),
      explode(split(col("text"), " ")).as("term"))
    val tc = toks.groupBy(col("lang"), col("term")).agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).as("c1"))
    val tot = tc.groupBy(col("lang")).agg(
      sum(col("c0")).as("t0"), sum(col("c1")).as("t1"),
      count(lit(1)).as("v"))
    val j = tc.join(broadcast(tot), Seq("lang"))
    val p = (col("c0").cast("double") + lit(1.0)) /
      (col("t0").cast("double") + col("v"))
    val q = (col("c1").cast("double") + lit(1.0)) /
      (col("t1").cast("double") + col("v"))
    def klSum(x: Column, y: Column): Column =
      sum(round(x * log(x / y), 9).cast(DecimalType(38, 9)))
        .cast("double")
    j.groupBy(col("lang")).agg(
      max(col("v")).as("vocab_size"),
      max(col("t0")).as("n_tokens_a"),
      max(col("t1")).as("n_tokens_b"),
      klSum(p, q).as("kl_ab"),
      klSum(q, p).as("kl_ba"))
  }

  /** DuckDB mirror of [[unigramDrift]] with `side = doc_id % 2`. */
  def unigramDriftSql(sideSql: String = "doc_id % 2"): String =
    s"""WITH toks AS (
       |  SELECT lang, CAST($sideSql AS INTEGER) AS side,
       |    unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), tc AS (
       |  SELECT lang, term,
       |    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
       |    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
       |  FROM toks GROUP BY lang, term
       |), tot AS (
       |  SELECT lang, CAST(SUM(c0) AS BIGINT) AS t0,
       |    CAST(SUM(c1) AS BIGINT) AS t1,
       |    CAST(COUNT(*) AS BIGINT) AS v
       |  FROM tc GROUP BY lang
       |), j AS (
       |  SELECT tc.lang,
       |    (CAST(c0 AS DOUBLE) + 1.0) / (CAST(t0 AS DOUBLE) + v) AS p,
       |    (CAST(c1 AS DOUBLE) + 1.0) / (CAST(t1 AS DOUBLE) + v) AS q,
       |    t0, t1, v
       |  FROM tc JOIN tot ON tc.lang = tot.lang
       |)
       |SELECT lang, MAX(v) AS vocab_size,
       |  MAX(t0) AS n_tokens_a, MAX(t1) AS n_tokens_b,
       |  CAST(SUM(CAST(ROUND(p * ln(p / q), 9) AS DECIMAL(38,9))) AS DOUBLE) AS kl_ab,
       |  CAST(SUM(CAST(ROUND(q * ln(q / p), 9) AS DECIMAL(38,9))) AS DOUBLE) AS kl_ba
       |FROM j GROUP BY lang
       |ORDER BY lang""".stripMargin
}
