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

  /** Count tables of the add-one bigram model trained on `reference`:
    * `(uni(u, c1), big(u, w, c2), vocab(vsz))`. Training is the
    * expensive half (two exploded aggregations over the reference) and
    * the model is a deploy-time ARTIFACT — train once at ingest, cache
    * (see [[graft.sim.IndexCache]]), score per query. */
  def trainBigram(reference: DataFrame,
                  textCol: String = "text"): (DataFrame, DataFrame, DataFrame) = {
    val uni = reference.select(explode(split(col(textCol), " ")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("vsz"))
    val big = reference.select(explode(bigramPairs(col(textCol))).as("bg"))
      .groupBy(col("bg.u").as("u"), col("bg.w").as("w"))
      .agg(count(lit(1)).as("c2"))
    (uni, big, vocab)
  }

  /** Scoring half of [[crossEntropy]] against a prebuilt
    * [[trainBigram]] model. */
  def scoreBigram(uni: DataFrame, big: DataFrame, vocab: DataFrame,
                  docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", scale: Int = 4): DataFrame = {
    val docTerms = docs.select(col(idCol),
        explode(bigramPairs(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.u").as("u"), col("bg.w").as("w"))
      .groupBy(col(idCol), col("u"), col("w"))
      .agg(count(lit(1)).as("n_occ"))
    // left joins: a doc bigram unseen in the reference still gets its
    // add-one-smoothed probability (c2 = 0, and c1 = 0 for an unseen
    // context) instead of silently vanishing from the score
    // unigram-keyed tables are vocab-bounded (they do NOT grow with
    // corpus size) — broadcast them; the bigram table stays a
    // co-partitioned join
    docTerms
      .join(big, Seq("u", "w"), "left")
      .join(broadcast(uni), Seq("u"), "left")
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

  /** Per-document cross-entropy of `docs` under an add-one bigram model
    * trained on `reference` (pass the same frame to self-score a
    * corpus). Output: (idCol, n_bigrams, cross_entropy) for docs with
    * at least one bigram; `cross_entropy` rounded to `scale` decimals.
    */
  def crossEntropy(reference: DataFrame, docs: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   scale: Int = 4): DataFrame = {
    val (uni, big, vocab) = trainBigram(reference, textCol)
    scoreBigram(uni, big, vocab, docs, idCol, textCol, scale)
  }

  /** Trigram triples (with multiplicity) as (u, v, w) structs; empty
    * under three tokens. */
  def trigramTriples(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => struct(element_at(toks, i + 1).as("u"),
          element_at(toks, i + 2).as("v"),
          element_at(toks, i + 3).as("w"))))
      .otherwise(array().cast("array<struct<u:string,v:string,w:string>>"))
  }

  /** Per-document cross-entropy under an INTERPOLATED trigram model
    * (Jelinek–Mercer linear interpolation — the standard order-3
    * smoothing; Chen & Goodman 1999 survey):
    *
    * `P(w|u,v) = λ3·(c(uvw)+1)/(c(uv)+|V|)
    *           + λ2·(c(vw)+1)/(c(v)+|V|)
    *           + λ1·(c(w)+1)/(N+|V|)`
    *
    * Each order is add-one smoothed, so unseen histories degrade
    * gracefully instead of zeroing the probability; the lower orders
    * dominate exactly when the higher-order context is sparse — the
    * behavior that separates a trigram gate from the bigram one on
    * natural text. Still pure counts + one `ln` per distinct
    * (doc, trigram): engine-portable (q89 oracle parity), and the same
    * scale shape as [[crossEntropy]] with one more count table and two
    * more equi-joins — all shuffle-partitioned by token keys. Output:
    * (idCol, n_trigrams, cross_entropy) for docs with ≥ 1 trigram.
    *
    * Count tables:
    * `(uni(t, c1), totals(vsz, ntok), big(a, b, c2), tri(u, v, w, c3))`
    * — the ingest-time artifact for [[scoreTrigram]]. */
  def trainTrigram(reference: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val uni = reference.select(explode(split(col(textCol), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c1"))
    val totals = uni.agg(count(lit(1)).as("vsz"), sum(col("c1")).as("ntok"))
    val big = reference.select(explode(bigramPairs(col(textCol))).as("bg"))
      .groupBy(col("bg.u").as("a"), col("bg.w").as("b"))
      .agg(count(lit(1)).as("c2"))
    val tri = reference.select(explode(trigramTriples(col(textCol))).as("tg"))
      .groupBy(col("tg.u").as("u"), col("tg.v").as("v"), col("tg.w").as("w"))
      .agg(count(lit(1)).as("c3"))
    (uni, totals, big, tri)
  }

  /** Scoring half of [[crossEntropyTrigram]] against a prebuilt
    * [[trainTrigram]] model. */
  def scoreTrigram(uni: DataFrame, totals: DataFrame, big: DataFrame,
                   tri: DataFrame, docs: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   l3: Double = 0.7, l2: Double = 0.2, l1: Double = 0.1,
                   scale: Int = 4): DataFrame = {
    require(math.abs(l3 + l2 + l1 - 1.0) < 1e-9,
      s"interpolation weights must sum to 1, got $l3 + $l2 + $l1")
    val docTerms = docs.select(col(idCol),
        explode(trigramTriples(col(textCol))).as("tg"))
      .select(col(idCol), col("tg.u").as("u"), col("tg.v").as("v"),
        col("tg.w").as("w"))
      .groupBy(col(idCol), col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("n_occ"))

    val cz = (c: Column) => coalesce(c, lit(0L)).cast("double")
    docTerms
      .join(tri, Seq("u", "v", "w"), "left")
      // the bigram table is corpus-derived but still orders of
      // magnitude smaller than the doc-trigram stream; broadcast is
      // the single-box call — at a scale where it outgrows executor
      // memory, drop these two hints and the joins co-partition
      .join(broadcast(big.select(col("a").as("u"), col("b").as("v"),
        col("c2").as("c2uv"))), Seq("u", "v"), "left")
      .join(broadcast(big.select(col("a").as("v"), col("b").as("w"),
        col("c2").as("c2vw"))), Seq("v", "w"), "left")
      .join(broadcast(uni.select(col("t").as("v"), col("c1").as("c1v"))),
        Seq("v"), "left")
      .join(broadcast(uni.select(col("t").as("w"), col("c1").as("c1w"))),
        Seq("w"), "left")
      .crossJoin(totals)
      .groupBy(col(idCol))
      .agg(sum(col("n_occ")).as("n_trigrams"),
        round(
          -sum(col("n_occ") * log(
            lit(l3) * (cz(col("c3")) + 1.0) / (cz(col("c2uv")) + col("vsz")) +
              lit(l2) * (cz(col("c2vw")) + 1.0) / (cz(col("c1v")) + col("vsz")) +
              lit(l1) * (cz(col("c1w")) + 1.0) / (col("ntok") + col("vsz")))) /
            sum(col("n_occ")),
          scale).as("cross_entropy"))
  }

  /** Per-TYPE interpolated log-probability of every trigram SEEN in
    * the reference — the scoring constant of [[scoreTrigram]] hoisted
    * to trigram-type grain: `lp(u,v,w)` is a pure function of the
    * count tables, so ONE `ln` per distinct corpus trigram replaces
    * one per distinct (doc, trigram). Type-sized → cacheable as an
    * ingest artifact next to the counts; [[scoreTrigramSelf]] probes
    * it. The double is computed by the same expression tree as
    * [[scoreTrigram]]'s, so downstream sums see identical addends. */
  def trigramTypeScores(uni: DataFrame, totals: DataFrame, big: DataFrame,
                        tri: DataFrame, l3: Double = 0.7, l2: Double = 0.2,
                        l1: Double = 0.1): DataFrame = {
    require(math.abs(l3 + l2 + l1 - 1.0) < 1e-9,
      s"interpolation weights must sum to 1, got $l3 + $l2 + $l1")
    val cz = (c: Column) => coalesce(c, lit(0L)).cast("double")
    tri
      .join(broadcast(big.select(col("a").as("u"), col("b").as("v"),
        col("c2").as("c2uv"))), Seq("u", "v"), "left")
      .join(broadcast(big.select(col("a").as("v"), col("b").as("w"),
        col("c2").as("c2vw"))), Seq("v", "w"), "left")
      .join(broadcast(uni.select(col("t").as("v"), col("c1").as("c1v"))),
        Seq("v"), "left")
      .join(broadcast(uni.select(col("t").as("w"), col("c1").as("c1w"))),
        Seq("w"), "left")
      .crossJoin(totals)
      .select(col("u"), col("v"), col("w"),
        log(
          lit(l3) * (cz(col("c3")) + 1.0) / (cz(col("c2uv")) + col("vsz")) +
            lit(l2) * (cz(col("c2vw")) + 1.0) / (cz(col("c1v")) + col("vsz")) +
            lit(l1) * (cz(col("c1w")) + 1.0) / (col("ntok") + col("vsz")))
          .as("lp"))
  }

  /** SELF-scoring fast path over a prebuilt [[trigramTypeScores]]
    * table: requires docs ⊆ reference (every doc trigram is a seen
    * type, so the inner join loses nothing — exactly the q89 shape
    * where the corpus scores itself). Same addends as
    * [[scoreTrigram]]: `n_occ · lp` with `lp` from the identical
    * expression, so results hash-match the general path. */
  def scoreTrigramSelf(types: DataFrame, docs: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       scale: Int = 4): DataFrame = {
    val docTerms = docs.select(col(idCol),
        explode(trigramTriples(col(textCol))).as("tg"))
      .select(col(idCol), col("tg.u").as("u"), col("tg.v").as("v"),
        col("tg.w").as("w"))
      .groupBy(col(idCol), col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("n_occ"))
    // SHUFFLE_HASH on the type table: post-aggregation size estimates
    // otherwise let the planner BROADCAST the (doc, trigram)-grain
    // side (observed: BuildLeft over docTerms) — a doc-grain build
    // side is a single-threaded multi-MB broadcast here and a scale
    // bug at 100 TB. The type table is the smaller, corpus-type-grain
    // side; hashing it per partition keeps both sides distributed.
    docTerms.join(types.hint("SHUFFLE_HASH"), Seq("u", "v", "w"))
      .groupBy(col(idCol))
      .agg(sum(col("n_occ")).as("n_trigrams"),
        round(-sum(col("n_occ") * col("lp")) / sum(col("n_occ")), scale)
          .as("cross_entropy"))
  }

  /** [[trainTrigram]] + [[scoreTrigram]] in one call (self-score a
    * corpus by passing the same frame twice). */
  def crossEntropyTrigram(reference: DataFrame, docs: DataFrame,
                          idCol: String = "doc_id", textCol: String = "text",
                          l3: Double = 0.7, l2: Double = 0.2, l1: Double = 0.1,
                          scale: Int = 4): DataFrame = {
    val (uni, totals, big, tri) = trainTrigram(reference, textCol)
    scoreTrigram(uni, totals, big, tri, docs, idCol, textCol, l3, l2, l1, scale)
  }

  /** Count tables of the interpolated KNESER–NEY bigram model (Kneser &
    * Ney 1995; Chen & Goodman 1999 formulation):
    *
    * `(big(u, w, c2), ctx(u, cu, n1p), n1pr(w, npr), consts(btot, vsz))`
    *
    * where `cu = Σ_w c(u,w)` (bigram-context mass), `n1p(u) = |{w :
    * c(u,w) > 0}|` (distinct continuations of u — the discount mass
    * router), `npr(w) = |{u : c(u,w) > 0}|` (distinct LEFT contexts of
    * w — the continuation count that replaces raw frequency), `btot` =
    * distinct bigram types, `vsz` = continuation vocabulary. All exact
    * BIGINTs — the ingest-time artifact for [[scoreKneserNey]]. */
  def trainKneserNey(reference: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val big = reference.select(explode(bigramPairs(col(textCol))).as("bg"))
      .groupBy(col("bg.u").as("u"), col("bg.w").as("w"))
      .agg(count(lit(1)).as("c2"))
    val ctx = big.groupBy("u")
      .agg(sum(col("c2")).as("cu"), count(lit(1)).as("n1p"))
    val n1pr = big.groupBy(col("w")).agg(count(lit(1)).as("npr"))
    val consts = big.agg(count(lit(1)).as("btot"),
      count_distinct(col("w")).as("vsz"))
    (big, ctx, n1pr, consts)
  }

  /** Per-document cross-entropy under the interpolated Kneser–Ney
    * bigram model with absolute discount `d`:
    *
    * `P(w|u) = max(c(uw)−d, 0)/cu + ((d·n1p(u))/cu) · Pcont(w)` with
    * `Pcont(w) = (npr(w)+1)/(btot+vsz)` — the continuation distribution
    * add-one smoothed so unseen words keep positive mass (the standard
    * OOV guard); an unseen context backs off to `Pcont` alone.
    *
    * Same engine-portable discipline as [[scoreBigram]]: exact counts,
    * one `ln` per distinct (doc, bigram), explicit operator association
    * mirrored by the q100 oracle. Output: (idCol, n_bigrams,
    * cross_entropy). */
  def scoreKneserNey(big: DataFrame, ctx: DataFrame, n1pr: DataFrame,
                     consts: DataFrame, docs: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text",
                     d: Double = 0.75, scale: Int = 4): DataFrame = {
    require(d > 0 && d < 1, s"absolute discount must be in (0,1): $d")
    val docTerms = docs.select(col(idCol),
        explode(bigramPairs(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.u").as("u"), col("bg.w").as("w"))
      .groupBy(col(idCol), col("u"), col("w"))
      .agg(count(lit(1)).as("n_occ"))
    val pcont = (coalesce(col("npr"), lit(0L)) + lit(1.0)) /
      (col("btot") + col("vsz"))
    val p = when(col("cu").isNull, pcont)
      .otherwise(
        (greatest(coalesce(col("c2"), lit(0L)) - lit(d), lit(0.0)) / col("cu")) +
          (((lit(d) * col("n1p")) / col("cu")) * pcont))
    // ctx/n1pr are vocab-bounded word tables — broadcast (two fewer
    // reshuffles of the doc-bigram stream); big stays co-partitioned
    docTerms
      .join(big, Seq("u", "w"), "left")
      .join(broadcast(ctx), Seq("u"), "left")
      .join(broadcast(n1pr), Seq("w"), "left")
      .crossJoin(consts)
      .groupBy(col(idCol))
      .agg(sum(col("n_occ")).as("n_bigrams"),
        round(-sum(col("n_occ") * log(p)) / sum(col("n_occ")), scale)
          .as("cross_entropy"))
  }

  /** CCNet-style head/middle/tail corpus split (Wenzek et al., "CCNet:
    * Extracting high quality monolingual datasets from web crawl data",
    * 2020 §4.4): documents bucket by LM cross-entropy against tercile
    * cut points, and downstream mixing samples the buckets at different
    * rates.
    *
    * The cuts are exact order statistics (no interpolation — engine-
    * portable on the score's fixed decimal grain) of `scoredSample`, a
    * deterministic sample of the scored corpus. That is the scale
    * design CCNet itself uses: thresholds come from a bounded sample —
    * only the sample is rank-sorted (one window over ~0.1% of rows at
    * production scale) — and travel to the corpus as two broadcast
    * scalars; the corpus itself is never globally sorted.
    *
    * Sums aggregate in DECIMAL so partial-aggregation order cannot
    * perturb the output. Output: one row per bucket with doc count and
    * score envelope. */
  def perplexityBuckets(scored: DataFrame, scoredSample: DataFrame,
                        idCol: String = "doc_id",
                        ceCol: String = "cross_entropy"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // tercile cuts via distributed rank — the sample is doc-grain, so
    // an unpartitioned row_number/count window would single-task it
    val base = scoredSample.select(col(ceCol).as("ce"), col(idCol))
    val nDf = base.agg(count(lit(1)).as("n"))
    val ranked = graft.operators.Ranks
      .withGlobalRank(base, Seq(col("ce"), col(idCol)), "rn")
      .crossJoin(broadcast(nDf))
    val cuts = ranked.agg(
      max(when(col("rn") === ceil(col("n") / lit(3.0)), col("ce"))).as("c1"),
      max(when(col("rn") === ceil(col("n") * lit(2.0) / lit(3.0)), col("ce"))).as("c2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col(ceCol) <= col("c1"), "head")
          .when(col(ceCol) <= col("c2"), "middle")
          .otherwise("tail"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col(ceCol)).as("min_ce"),
        max(col(ceCol)).as("max_ce"),
        round(sum(col(ceCol).cast(DecimalType(18, 4))).cast("double")
          / count(lit(1)), 4).as("avg_ce"))
  }
}
