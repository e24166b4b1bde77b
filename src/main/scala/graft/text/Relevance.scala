package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relevance scoring over a document corpus: TF-IDF term weights and
  * BM25 keyword search (Robertson & Spärck Jones; the BM25 form follows
  * Robertson et al., TREC-3 1994 — public literature).
  *
  * The reference pipeline ships documents into an OLAP store where
  * ranked keyword retrieval is a standard consumer; for an LLM-corpus
  * pipeline the same scores drive keyword-based corpus slicing and
  * search-engine-style eval-set mining.
  *
  * Scale notes (100 TB): [[tfIdf]] is two hash aggregations (doc×term,
  * then term) plus an equi-join on `term` — all key-partitioned
  * shuffles, no broadcast of anything corpus-sized; the corpus-level
  * scalar (document count) crosses as a broadcast single row. [[bm25]]
  * never explodes tokens at all: for a FIXED query term list the
  * per-document term frequencies are narrow map-side expressions, and
  * the per-term document frequencies reduce to one 1-row aggregate that
  * is broadcast back — a 100 TB corpus is scored in a single map pass
  * over the documents plus one tiny exchange.
  *
  * Determinism: double sums here only ever accumulate integer-valued
  * doubles (token counts, doc lengths < 2^53), which double addition
  * represents exactly in any order — so aggregation order cannot change
  * results, and cross-engine (DuckDB oracle) parity holds. The only
  * non-exactly-rounded operation is `ln`; callers that need
  * engine-portable output round scores (see `round(_, 6)` in the q73/
  * q74 queries).
  */
object Relevance {

  /** Per-(document, term) TF-IDF weights: `tf` raw in-document count,
    * `df` number of documents containing the term, `tfidf = tf *
    * ln(nDocs/df)`. Empty tokens are dropped; the tokenizer is the
    * corpus-wide whitespace split shared with [[TextAnalysis]]. */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("tfidf"))
  }

  /** Top-`k` characteristic terms per document, ranked by TF-IDF
    * rounded to 6 decimals (ties broken by term) — the rounding makes
    * the ranking identical across engines despite `ln` ulp wiggle. */
  def topTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(k > 0, s"topTerms needs k > 0, got $k")
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("tfidf"), 6).desc, col("term"))
    tfIdf(docs, idCol, textCol)
      .withColumn("score", round(col("tfidf"), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn", "tfidf")
  }

  /** BM25 relevance of every document against a fixed keyword query.
    * Output: (idCol, bm25). Uses the Lucene-style positive idf
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`; `k1` saturates term
    * frequency, `b` dials length normalization.
    *
    * The per-term partial scores are summed as a fixed left-to-right
    * column expression (not an aggregation), so the floating-point
    * summation order is part of the operator's contract — deterministic
    * and mirrorable in SQL. */
  def bm25(docs: DataFrame, query: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    require(query.distinct == query, s"duplicate query terms: $query")
    val toks = TextAnalysis.tokens(col(textCol))
    val tfCols = query.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("double").as(s"tf_$i")
    }
    val base = docs.select(col(idCol) +: size(toks).cast("double").as("dl") +: tfCols: _*)
    val dfAggs = query.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df_$i"))
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      (avg(col("dl")).as("avg_dl") +: dfAggs): _*)
    val score = query.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
      val lenNorm = lit(1.0 - b) + lit(b) * col("dl") / col("avg_dl")
      idf * (col(s"tf_$i") * lit(k1 + 1.0)) /
        (col(s"tf_$i") + lit(k1) * lenNorm)
    }.reduceLeft(_ + _)
    base.crossJoin(broadcast(stats)).select(col(idCol), score.as("bm25"))
  }

  /** Positional phrase search: documents containing the exact token
    * sequence `phrase`, with occurrence counts (overlapping starts
    * each count). The classic positional-inverted-index query: build
    * (doc, position) postings per phrase term, then close the phrase
    * with equi-joins on (doc, alignedPosition) — term i must sit at
    * `pos(first) + i`.
    *
    * Scale shape: postings are filtered to the phrase's terms BEFORE
    * any join (highly selective — the postings lists of 2–5 fixed
    * terms, not the full token explosion), and every join is an
    * equi-join on (doc, pos), so the work is O(Σ postings of the
    * phrase terms) however large the corpus. No window, no broadcast
    * of anything corpus-sized. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 tokens, got $phrase")
    val pos = docs
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
    def postings(term: String, offset: Int): DataFrame =
      pos.where(col("tok") === term)
        .select(col(idCol), (col("pos") - offset).as("pos"))
    phrase.zipWithIndex
      .map { case (term, i) => postings(term, i) }
      .reduce(_.join(_, Seq(idCol, "pos")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("occurrences"))
  }
}
