package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{LanguageModel => LM}

/** Data-selection importance weighting in the DSIR shape (Xie et al.
  * 2023, arXiv:2302.03169 — public): score every document by the
  * log-likelihood ratio of its hashed n-gram features under a TARGET
  * distribution (the high-quality slice you want more of) versus the
  * SOURCE distribution (the whole corpus). Documents whose feature mass
  * looks like the target get positive weights; resampling by these
  * weights tilts the corpus toward the target domain without a learned
  * classifier.
  *
  * Model: word bigrams hashed into `buckets` buckets (the fixed-width
  * feature space that makes the estimator tractable at corpus scale),
  * add-one smoothed categorical distributions on both sides,
  * per-document weight = (1/N) Σ ln(p_target(b)/p_source(b)) over its N
  * bigram occurrences.
  *
  * Engine-portable by construction: the bucket hash is the md5-derived
  * 60-bit primitive (same as [[graft.functions.PortableHash]] — SQL
  * mirror `('0x' || substr(md5(s), 1, 15))::BIGINT`), counts are exact
  * BIGINTs, and the score is one `ln` per distinct (doc, bucket) summed
  * at ~1e0 magnitude — associativity drift ~1e-13, rounded away at the
  * 1e-4 output grain (same argument as [[LanguageModel]], proven by the
  * q82 oracle).
  *
  * Scale shape: two hash aggregations over exploded bigrams (per-bucket
  * counts carry the target flag as a conditional sum — ONE pass for
  * both distributions), a broadcast-sized bucket table joined back, and
  * a per-doc final aggregate. No driver state; the bucket table is
  * `buckets` rows regardless of corpus size. */
object Importance {

  /** Bucket id of a feature string: top 60 bits of md5, mod `buckets`.
    * Built-ins only (md5/conv/substring are codegen'd). */
  def featureBucket(feature: Column, buckets: Int): Column =
    pmod(conv(substring(md5(feature.cast("binary")), 1, 15), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Per-bucket model table (b, sc, tc, ns, nt) — the TRAIN half (one
    * pass over the exploded grams yields BOTH distributions: the source
    * count and, via the flag, the target count per bucket). `buckets`
    * rows regardless of corpus size: a deploy-time artifact, cache it
    * (e.g. via [[graft.sim.IndexCache]]). */
  def trainBuckets(docs: DataFrame, targetPred: Column, buckets: Int = 256,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val grams = docs.select(targetPred.as("is_t"),
        explode(LM.bigramPairs(col(textCol))).as("bg"))
      .select(col("is_t"),
        featureBucket(concat_ws(" ", col("bg.u"), col("bg.w")), buckets).as("b"))
    val counts = grams.groupBy("b").agg(
      count(lit(1)).as("sc"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"))
    counts.crossJoin(counts.agg(sum(col("sc")).as("ns"),
      sum(col("tc")).as("nt")))
  }

  /** Scoring half against a prebuilt [[trainBuckets]] model. */
  def scoreWeights(model: DataFrame, docs: DataFrame, buckets: Int = 256,
                   idCol: String = "doc_id", textCol: String = "text",
                   scale: Int = 4): DataFrame = {
    val docTerms = docs.select(col(idCol),
        explode(LM.bigramPairs(col(textCol))).as("bg"))
      .select(col(idCol),
        featureBucket(concat_ws(" ", col("bg.u"), col("bg.w")), buckets).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("n_occ"))
    // LEFT join: a bucket unseen in training still gets its add-one
    // smoothed ratio (sc = tc = 0) instead of silently vanishing from
    // the score — the case that appears exactly when scoring NEW docs
    // against a cached model (the deploy split this API exists for).
    // The totals ride every model row, so recover them from any match
    // or from a 1-row broadcast for the all-unseen corner.
    val totals = model.select(col("ns"), col("nt")).limit(1)
    docTerms
      .join(model.withColumnRenamed("ns", "m_ns")
        .withColumnRenamed("nt", "m_nt"), Seq("b"), "left")
      .crossJoin(totals)
      .groupBy(col(idCol))
      .agg(sum(col("n_occ")).as("n_bigrams"),
        round(
          sum(col("n_occ") * log(
            ((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
              (col("nt") + lit(buckets.toDouble))) /
              ((coalesce(col("sc"), lit(0L)) + lit(1.0)) /
                (col("ns") + lit(buckets.toDouble))))) /
            sum(col("n_occ")),
          scale).as("logratio"))
  }

  /** Per-document importance weights of `docs` with the target slice
    * selected by `targetPred` (a boolean over the document's columns).
    * Output: (idCol, n_bigrams, logratio) for docs with >= 1 bigram,
    * `logratio` rounded to `scale` decimals — positive means
    * target-like. */
  def importanceWeights(docs: DataFrame, targetPred: Column,
                        buckets: Int = 256, idCol: String = "doc_id",
                        textCol: String = "text", scale: Int = 4): DataFrame =
    scoreWeights(trainBuckets(docs, targetPred, buckets, idCol, textCol),
      docs, buckets, idCol, textCol, scale)

  /** The DSIR RESAMPLING step over [[importanceWeights]]: accept each
    * document with probability min(1, p_target/p_source) — rejection
    * sampling toward the target distribution — decided by the same
    * deterministic integer acceptance test as
    * [[Corpus.resampleToMixture]]: `hashBucket(id, 10^6) <
    * round(10^6 · exp(min(logratio, 0)))`. Reproducible anywhere, no
    * RNG state. Output: (idCol, p_accept_micro, kept). */
  def resampleByWeight(docs: DataFrame, targetPred: Column,
                       buckets: Int = 256, idCol: String = "doc_id",
                       textCol: String = "text", scale: Int = 4): DataFrame =
    resampleFromWeights(
      importanceWeights(docs, targetPred, buckets, idCol, textCol, scale),
      idCol)

  /** The acceptance decision over a prebuilt weights frame
    * ([[importanceWeights]] / [[scoreWeights]] output). */
  def resampleFromWeights(w: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val p = round(lit(1000000.0) * exp(least(col("logratio"), lit(0.0))))
      .cast("long")
    w.select(col(idCol), p.as("p_accept_micro"),
      (Corpus.hashBucket(col(idCol), 1000000) < p).as("kept"))
  }

  /** The weight pipeline as DuckDB CTEs ending in
    * `w(idCol, n_bigrams, logratio)` — shared by both oracles. */
  private def weightsCtes(table: String, targetPred: String, buckets: Int,
                          idCol: String, textCol: String, scale: Int): String =
    s"""g AS MATERIALIZED (
       |  SELECT $idCol, is_t,
       |    ('0x' || substr(md5(bg.u || ' ' || bg.w), 1, 15))::BIGINT % $buckets AS b
       |  FROM (
       |    SELECT $idCol, is_t,
       |      unnest([{'u': t[i], 'w': t[i + 1]} FOR i IN range(1, len(t))]) AS bg
       |    FROM (SELECT $idCol, ($targetPred) AS is_t,
       |          string_split($textCol, ' ') AS t FROM $table)
       |  )
       |), cnt AS (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS sc,
       |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tc
       |  FROM g GROUP BY b
       |), tot AS (
       |  SELECT CAST(SUM(sc) AS BIGINT) AS ns, CAST(SUM(tc) AS BIGINT) AS nt
       |  FROM cnt
       |), dt AS (
       |  SELECT $idCol, b, CAST(COUNT(*) AS BIGINT) AS n_occ
       |  FROM g GROUP BY $idCol, b
       |), w AS (
       |  SELECT dt.$idCol, CAST(SUM(dt.n_occ) AS BIGINT) AS n_bigrams,
       |    ROUND(SUM(dt.n_occ * ln(
       |        ((cnt.tc + 1.0) / (tot.nt + $buckets.0)) /
       |        ((cnt.sc + 1.0) / (tot.ns + $buckets.0)))) / SUM(dt.n_occ),
       |      $scale) AS logratio
       |  FROM dt JOIN cnt ON dt.b = cnt.b
       |  CROSS JOIN tot
       |  GROUP BY dt.$idCol
       |)""".stripMargin

  /** DuckDB oracle reproducing [[importanceWeights]] exactly.
    * `targetPred` is SQL over `table`'s columns (e.g. "lang = 'en'"). */
  def importanceWeightsSql(table: String, targetPred: String,
                           buckets: Int = 256, idCol: String = "doc_id",
                           textCol: String = "text", scale: Int = 4): String =
    s"""WITH ${weightsCtes(table, targetPred, buckets, idCol, textCol, scale)}
       |SELECT $idCol, n_bigrams, logratio FROM w ORDER BY $idCol""".stripMargin

  /** DuckDB oracle reproducing [[resampleByWeight]] exactly. */
  def resampleByWeightSql(table: String, targetPred: String,
                          buckets: Int = 256, idCol: String = "doc_id",
                          textCol: String = "text", scale: Int = 4): String =
    s"""WITH ${weightsCtes(table, targetPred, buckets, idCol, textCol, scale)}
       |SELECT $idCol, p_accept_micro,
       |  ${Corpus.hashBucketSql(idCol, 1000000)} < p_accept_micro AS kept
       |FROM (
       |  SELECT $idCol,
       |    CAST(round(1000000.0 * exp(least(logratio, 0))) AS BIGINT)
       |      AS p_accept_micro
       |  FROM w
       |)
       |ORDER BY $idCol""".stripMargin
}
