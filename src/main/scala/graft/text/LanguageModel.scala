package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the CCNet/RefinedWeb-style quality
  * gate: train token statistics on a reference corpus, score every
  * document by its per-token cross-entropy under the model, and filter
  * (or bucket) on the score. Junk text (symbol salad, boilerplate
  * repetition, wrong-language content) sits far from the reference
  * distribution and scores high.
  *
  * Model: add-one-smoothed bigram MLE,
  * `P(w|u) = (c(u,w) + 1) / (c(u) + |V|)`; a document's score is
  * `-(1/N) Σ ln P` over its N bigram occurrences. Everything is counts
  * plus one `ln` per distinct (doc, bigram), so any engine reproduces
  * it (oracle parity shown in q82).
  *
  * Scale shape: three hash aggregations (unigrams, bigrams, per-doc
  * bigram multiplicities) and two equi-joins on token keys — all
  * shuffle-partitioned by token, no driver-side state, no broadcast
  * requirement (AQE may still elect one when the vocabulary is small).
  * Per-doc terms are summed with a plain partial+final aggregate; at
  * ~1e1 magnitude per term the float associativity drift is ~1e-13,
  * rounded away well below the 1e-4 output grain. */
object LanguageModel {

  /** Bigram sequence (with multiplicity) of a whitespace-tokenized
    * text, as (u, w) structs. Empty for texts under two tokens — the
    * `when` guard matters because `sequence(0, -1)` is descending, not
    * empty. */
  def bigramPairs(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("u"),
          element_at(toks, i + 2).as("w"))))
      .otherwise(array().cast("array<struct<u:string,w:string>>"))
  }

  /** Per-document cross-entropy of `docs` under an add-one bigram model
    * trained on `reference` (pass the same frame to self-score a
    * corpus). Output: (idCol, n_bigrams, cross_entropy) for docs with
    * at least one bigram; `cross_entropy` rounded to `scale` decimals.
    */
  def crossEntropy(reference: DataFrame, docs: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   scale: Int = 4): DataFrame = {
    def pairs(df: DataFrame) = df.select(col(idCol),
        explode(bigramPairs(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.u").as("u"), col("bg.w").as("w"))

    val refToks = reference.select(
      explode(split(col(textCol), " ")).as("u"))
    val uni = refToks.groupBy("u").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("vsz"))
    val big = pairs(reference).groupBy("u", "w").agg(count(lit(1)).as("c2"))

    val docTerms = pairs(docs).groupBy(col(idCol), col("u"), col("w"))
      .agg(count(lit(1)).as("n_occ"))
    // left joins: a doc bigram unseen in the reference still gets its
    // add-one-smoothed probability (c2 = 0, and c1 = 0 for an unseen
    // context) instead of silently vanishing from the score
    docTerms
      .join(big, Seq("u", "w"), "left")
      .join(uni, Seq("u"), "left")
      .crossJoin(vocab)
      .groupBy(col(idCol))
      .agg(sum(col("n_occ")).as("n_bigrams"),
        round(
          -sum(col("n_occ") *
            log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
              (coalesce(col("c1"), lit(0L)) + col("vsz")))) /
            sum(col("n_occ")),
          scale).as("cross_entropy"))
  }
}
