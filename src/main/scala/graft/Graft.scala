package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.cdc.{CdcSim, DecodeOptions, EnvelopeDecode}
import graft.operators.{AsOfJoin, Versioned}
import graft.streaming.{ParquetStateStore, Sessionize}

/** Single entry point to the engine — what a user of the reference
  * pipeline programs against after switching to this library.
  *
  * {{{
  * import graft.Graft
  *
  * // CDC: raw envelope JSON → typed change rows → current state
  * val changes = Graft.decodeChanges(rawKafkaValues, productsSchema)
  * val state   = Graft.currentState(changes, keys = Seq("id"),
  *                 versionCols = Seq("__ts_ms", "__lsn"))
  *
  * // LLM-corpus operators
  * val dups    = Graft.nearDuplicates(docs)             // MinHash+LSH
  * val topk    = Graft.similarTopK(corpus, queries, 10) // exact ANN
  * val scored  = docs.withColumn("quality", Graft.qualityScore($"text"))
  *
  * // SQL surface
  * Graft.registerFunctions(spark)  // cosine_similarity(...), simhash64(...)
  * }}}
  */
object Graft {

  // ---- CDC -----------------------------------------------------------

  /** Envelope JSON → unwrapped change rows (policies via `opts`). */
  def decodeChanges(raw: DataFrame,
                    rowSchema: org.apache.spark.sql.types.StructType,
                    opts: DecodeOptions = DecodeOptions()): DataFrame =
    EnvelopeDecode.changes(raw, rowSchema, opts)

  /** Last-writer-wins current state of a change set. */
  def currentState(changes: DataFrame, keys: Seq[String],
                   versionCols: Seq[String]): DataFrame =
    Versioned.latestByKey(changes, keys,
      versionCols.map(org.apache.spark.sql.functions.col))

  /** Keyed, versioned upsert store (parquet; swap in Delta/Iceberg
    * MERGE on a cluster). */
  def stateStore(path: String, keys: Seq[String], versionCols: Seq[String],
                 deletedCol: Option[String] = Some("__deleted")): ParquetStateStore =
    new ParquetStateStore(path, keys, versionCols, deletedCol)

  /** Additive keyed state (SummingMergeTree analog) — write through
    * [[streaming.Sinks.aggregatingUpsert]] for exactly-once sums. */
  def summingStore(path: String, keys: Seq[String],
                   sumCols: Seq[String]): streaming.SummingStateStore =
    new streaming.SummingStateStore(path, keys, sumCols)

  /** Per-key mergeable-sketch state (AggregatingMergeTree analog) —
    * write through [[streaming.Sinks.sketchUpsert]]. */
  def sketchStore(path: String, keys: Seq[String],
                  sketchCols: Seq[String]): streaming.SketchStateStore =
    new streaming.SketchStateStore(path, keys, sketchCols)

  /** Per-key QUANTILE sketch state (quantileState/quantileMerge
    * analog): columns hold DDSketch binaries from
    * [[functions.QuantileSketch.sketchAgg]], collapsed by sketch
    * union; read quantiles with [[functions.QuantileSketch.quantile]].
    */
  def quantileStore(path: String, keys: Seq[String],
                    sketchCols: Seq[String]): streaming.SketchStateStore =
    new streaming.SketchStateStore(path, keys, sketchCols,
      mergeAgg = _ => functions.QuantileSketch.merge)

  // ---- analytics helpers ---------------------------------------------

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String]): DataFrame =
    AsOfJoin.asofBackward(left, right, keys, leftTs, rightTs, rightValueCols)

  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    Sessionize.batch(events, gapMinutes)

  // ---- LLM-corpus operators ------------------------------------------

  /** MinHash+LSH near-duplicate pairs, exact-Jaccard verified. */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.6): DataFrame =
    dedup.Dedup.minhashPairs(docs, threshold = threshold)

  /** End-to-end corpus dedup: near-dup pairs → connected components →
    * keep the smallest-id member of each duplicate group. */
  def dedupNearDuplicates(docs: DataFrame, threshold: Double = 0.6): DataFrame =
    dedup.Dedup.keepOnePerCluster(docs,
      dedup.Dedup.minhashPairs(docs, threshold = threshold))

  /** Exact cosine top-k for each query vector. */
  def similarTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    sim.Similarity.bruteForceTopK(corpus, queries, k)

  /** Approximate cosine top-k via an IVF index with Lloyd-refined
    * centroids (the scale path; recall dialed by nProbe/nCentroids). */
  def similarTopKApprox(corpus: DataFrame, queries: DataFrame, k: Int,
                        nCentroids: Int = 16, nProbe: Int = 4): DataFrame =
    sim.Similarity.ivfTopK(corpus, queries, k, nCentroids, nProbe)

  /** Product-quantization codebooks + codes for an embedding column —
    * the memory-side ANN scale path (m small ints per vector instead of
    * 4·dim bytes); score codes with
    * [[sim.ProductQuantization.adcTopK]]. */
  def pqIndex(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16)
      : (DataFrame, DataFrame) = {
    val cb = sim.ProductQuantization.trainCodebooks(corpus, dim, m, k)
    (cb, sim.ProductQuantization.encode(corpus, cb, dim, m))
  }

  /** Drop training docs sharing ≥ `minOverlap` word shingles with the
    * (small, broadcast) eval set — benchmark decontamination. */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
                    minOverlap: Int = 5): DataFrame =
    dedup.Dedup.decontaminate(train, evalSet, minOverlap = minOverlap)

  /** [[decontaminate]]'s contamination check through a Bloom semi-join
    * reduction: the eval shingle set folds into one broadcast bit
    * array probed inside the corpus scan (row-identical results; the
    * 100 TB path). */
  def contaminationBloom(train: DataFrame, evalSet: DataFrame,
                         minOverlap: Int = 5): DataFrame =
    dedup.Dedup.contaminationBloom(train, evalSet, minOverlap = minOverlap)

  /** Build a Bloom filter over one column (mergeable partial
    * aggregates; one filter-sized value materialized) — probe with
    * [[functions.Bloom.mightContain]] for semi-join reduction. */
  def bloomFilter(df: DataFrame, item: Column, expectedItems: Long,
                  fpp: Double = 0.01): Array[Byte] =
    functions.Bloom.buildFilter(df, item, expectedItems, fpp)

  /** Record pairs within `maxDist` edit distance — FastSS
    * deletion-neighborhood blocking + exact levenshtein verify (linear
    * candidate volume; for short keys like names/titles/codes). */
  def fuzzyMatches(recs: DataFrame, maxDist: Int = 2,
                   idCol: String = "id", strCol: String = "name"): DataFrame =
    dedup.Dedup.fuzzyPairs(recs, maxDist, idCol, strCol)

  /** Near-dups of an arriving batch against a standing corpus —
    * O(batch × touched postings), never corpus² (admission-time gate). */
  def crossNearDuplicates(corpus: DataFrame, batch: DataFrame,
                          threshold: Double = 0.5): DataFrame =
    dedup.Dedup.crossJaccardPairs(corpus, batch, threshold = threshold)

  /** Streaming dedup admission: per micro-batch self-dedup + corpus
    * check, appending only novel docs (replay-idempotent). */
  def dedupAdmission(docs: DataFrame, corpusPath: String, checkpoint: String,
                     threshold: Double = 0.5) =
    streaming.AdmissionGate.dedupAdmission(docs, corpusPath, checkpoint,
      threshold = threshold)

  /** Streaming EMBEDDING dedup admission: per micro-batch LSH self-
    * collapse + corpus near-dup check (cosine >= threshold), appending
    * only novel vectors (replay-idempotent via self-match masking). */
  def embeddingAdmission(vectors: DataFrame, corpusPath: String,
                         checkpoint: String, threshold: Double = 0.9) =
    streaming.EmbeddingAdmission.nearDupAdmission(vectors, corpusPath,
      checkpoint, threshold = threshold)

  /** Admission-gated corpus with a MATERIALIZED shingle index — the
    * 100 TB admission path: postings land once per admitted doc, each
    * batch probes only the index buckets it touches, and docs +
    * postings commit in one fenced atomic manifest swap (exactly-once
    * admission). Stream into it with
    * [[streaming.AdmissionGate.dedupAdmissionIndexed]]. */
  def indexedCorpus(path: String, shingleK: Int = 3): streaming.IndexedCorpus =
    new streaming.IndexedCorpus(path, shingleK = shingleK)

  /** Embedding analog of [[indexedCorpus]]: admitted vectors land with
    * their narrow LSH signature rows in one fenced manifest swap; each
    * batch probes only the touched signature partitions, and rescoring
    * touches candidate vectors, not the corpus. Stream into it with
    * [[streaming.EmbeddingAdmission.nearDupAdmissionIndexed]]. */
  def indexedVectorCorpus(path: String, bits: Int = 4,
                          tables: Int = 8): streaming.IndexedVectorCorpus =
    new streaming.IndexedVectorCorpus(path, bits = bits, tables = tables)

  /** Funnel depth / retention / sequence analytics (ClickHouse
    * windowFunnel, retention, sequenceMatch/Count analogs) — aggregate
    * columns for use inside `.agg(...)`. */
  def windowFunnel(tsMicros: Column, windowMicros: Long,
                   conds: Seq[Column]): Column =
    functions.Funnel.windowFunnel(tsMicros, windowMicros, conds)
  def sequenceCount(tsMicros: Column, conds: Seq[Column]): Column =
    functions.Funnel.sequenceCount(tsMicros, conds)
  def sequenceMatch(tsMicros: Column, conds: Seq[Column]): Column =
    functions.Funnel.sequenceMatch(tsMicros, conds)
  def sequenceCountTimed(tsMicros: Column, conds: Seq[Column],
                         maxGaps: Seq[Long]): Column =
    functions.Funnel.sequenceCountTimed(tsMicros, conds, maxGaps)
  def retentionFlags(conds: Seq[Column]): Seq[Column] =
    functions.Funnel.retentionFlags(conds)

  /** Heavy hitters (topK / topKWeighted analogs) — aggregate columns
    * for `.agg(...)`; exact when distinct items fit `capacity`. */
  def approxTopK(item: Column, k: Int, capacity: Int = 1024): Column =
    functions.HeavyHitters.approxTopK(item, k, capacity)
  def approxTopKWeighted(item: Column, weight: Column, k: Int,
                         capacity: Int = 1024): Column =
    functions.HeavyHitters.approxTopKWeighted(item, weight, k, capacity)

  /** Mergeable summaries: DDSketch quantiles (relative-error bound,
    * quantileState analog) and theta sketches (distinct counting with
    * set operations over sketch bytes). */
  def quantileSketch(x: Column, alpha: Double = 0.01): Column =
    functions.QuantileSketch.sketchAgg(x, alpha)
  def quantileOf(sketch: Column, q: Double): Column =
    functions.QuantileSketch.quantile(sketch, q)
  def thetaSketch(item: Column, k: Int = 4096): Column =
    functions.ThetaSketch.sketchAgg(item, k)
  def thetaIntersect(a: Column, b: Column): Column =
    functions.ThetaSketch.intersectEstimate(a, b)

  /** Time-series shaping: dense tick axis with gap fill (WITH FILL
    * STEP analog) and recency-weighted averages. */
  def fillTimeSeries(df: DataFrame, tsCol: String, groupCols: Seq[String],
                     aggs: Map[String, Column], stepSec: Long): DataFrame =
    operators.GapFill.fillTimeSeries(df, tsCol, groupCols, aggs, stepSec)
  def timeDecayedAvg(df: DataFrame, tsSecCol: String, valueCol: String,
                     groupCols: Seq[String], tauSec: Double): DataFrame =
    operators.Decay.timeDecayedAvg(df, tsSecCol, valueCol, groupCols, tauSec)

  /** Watermarked stream-stream event-time interval join (bounded
    * state); see [[streaming.StreamJoins.intervalJoin]]. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long): DataFrame =
    streaming.StreamJoins.intervalJoin(left, right, key, leftTs, rightTs,
      lowerSec, upperSec)

  /** Per-doc cross-entropy under an add-one bigram LM trained on
    * `reference` — the CCNet-style perplexity quality gate. */
  def lmCrossEntropy(reference: DataFrame, docs: DataFrame): DataFrame =
    text.LanguageModel.crossEntropy(reference, docs)

  /** Order-3 upgrade: interpolated (Jelinek–Mercer) trigram
    * cross-entropy — lower orders take over where the trigram context
    * is sparse. */
  def lmCrossEntropyTrigram(reference: DataFrame, docs: DataFrame): DataFrame =
    text.LanguageModel.crossEntropyTrigram(reference, docs)

  def qualityScore(text: Column): Column = graft.text.TextAnalysis.qualityScore(text)
  def languageOf(text: Column): Column = graft.text.TextAnalysis.langId(text)
  def fingerprint(text: Column): Column = graft.text.TextAnalysis.fingerprint(text)
  def cosine(a: Column, b: Column): Column = functions.VectorFunctions.cosine(a, b)

  // ---- corpus preparation --------------------------------------------

  /** Reproducible train/val/test assignment — a pure function of the id
    * (stable as the corpus grows, recomputable by any engine). */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column =
    text.Corpus.splitAssign(id, trainPct, valPct)

  /** Deterministic k-per-stratum sample with grow-k stability.
    * `idCol` must be integral (enforced — the heap carries bigint ids);
    * `(stratumCol, idCol)` should be non-null and unique (NULL strata
    * never match the winner semi-join; duplicate ids all survive). */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
                       k: Int): DataFrame =
    text.Corpus.sampleStratified(df, idCol, stratumCol, k)

  /** Deterministic resampling to a target domain mixture (weights per
    * domain value; exact integer acceptance test, engine-portable). */
  def resampleToMixture(df: DataFrame, idCol: String, domainCol: String,
                        weights: Map[String, Int],
                        targetNum: Int, targetDen: Int): DataFrame =
    text.Corpus.resampleToMixture(df, idCol, domainCol, weights,
      targetNum, targetDen)

  /** Concat-and-chunk sequence packing per shard (adds seq_no).
    * `stratumCol` must be non-null and `(stratumCol, idCol)` unique —
    * the running offset's join-back silently drops NULL strata and a
    * non-total layout order leaves seq_no undefined. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    capacity: Int, stratumCol: String): DataFrame =
    text.Corpus.packSequences(df, idCol, tokenCol, capacity, stratumCol)

  /** DSIR-shaped importance weights: hashed-bigram log-likelihood ratio
    * of the target slice (`targetPred`) vs the whole corpus. */
  def importanceWeights(docs: DataFrame, targetPred: Column,
                        buckets: Int = 256): DataFrame =
    text.Importance.importanceWeights(docs, targetPred, buckets)

  /** DSIR resampling: accept with probability min(1, ratio) via a
    * deterministic integer acceptance test (engine-portable). */
  def resampleByImportance(docs: DataFrame, targetPred: Column,
                           buckets: Int = 256): DataFrame =
    text.Importance.resampleByWeight(docs, targetPred, buckets)

  /** SemDeDup-shaped semantic dedup over a seed-row IVF assignment:
    * within-cell near-dup components keep one representative each.
    * `asg` = (id, cell, vec) from
    * [[graft.sim.DataQuantizers.ivfAssignSeeded]]. */
  def semanticDedup(asg: DataFrame, emb: DataFrame,
                    threshold: Double = 0.4): DataFrame =
    sim.DataQuantizers.semanticDedup(asg, emb, threshold)

  // ---- storage maintenance -------------------------------------------

  /** Background small-file compaction for a streaming parquet archive
    * (ClickHouse background-merge analog): fold committed micro-batch
    * files into clustered target-size parts without touching the sink's
    * transaction log; read through [[streaming.ArchiveCompactor.read]].
    */
  def archiveCompactor(archivePath: String, compactPath: String,
                       clusterCols: Seq[String] = Nil): streaming.ArchiveCompactor =
    new streaming.ArchiveCompactor(archivePath, compactPath, clusterCols)

  /** Z-order (Morton) clustered parquet write: per-file min-max
    * footprints bounded in BOTH columns → scan pruning on either
    * (Delta OPTIMIZE ZORDER BY analog). */
  def zOrderWrite(df: DataFrame, a: Column, b: Column,
                  path: String, numFiles: Int): Unit =
    functions.ZOrder.clusteredWrite(df, a, b, path, numFiles)

  /** Register the engine's native expressions for `spark.sql`. */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.register(spark)

  /** The flagship demo pipeline over harness data (see SparkEntry). */
  def demo(spark: SparkSession, sfDir: String): DataFrame =
    CdcSim.currentState(CdcSim.orderEnvelopes(
      sources.Tables.load(spark, sfDir, "orders")))
}
