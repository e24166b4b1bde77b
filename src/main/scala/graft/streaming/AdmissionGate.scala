package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Streaming dedup admission — the gate a training corpus runs on
  * every arriving shard: a micro-batch is deduplicated within itself,
  * checked against the standing corpus, and only novel documents are
  * appended. The reference stack has no analog (ClickHouse dedups by
  * key, not content); this is the LLM-pipeline mandate's "dedup at
  * ingest" composed from the batch operators.
  *
  * Scale shape: the corpus-side check is [[Dedup.crossJaccardPairs]] —
  * an inverted-index equi-join on shingles, O(batch shingles × touched
  * postings), never O(corpus²) and never corpus-vs-corpus. The corpus
  * scan is a parquet read per batch; at 100 TB the same layout is a
  * bucketed/Delta table with the shingle index materialized once and
  * MERGE-maintained, which changes the constant, not the join shape.
  * For very large batches put MinHash banding ([[Dedup.minhashPairs]])
  * upstream of the exact verify.
  *
  * Replay safety: admission is naturally idempotent — a replayed batch
  * re-checks against a corpus that already contains its own admitted
  * docs, every one of which matches itself (jaccard 1.0 ≥ any
  * threshold), so nothing is re-admitted. The append itself uses one
  * deterministic task file per (batch, attempt); a crash between write
  * and checkpoint commit can leave at most one duplicate file, which
  * the next replay's self-match then masks from admission decisions. */
object AdmissionGate {

  /** One admission round (the foreachBatch body, exposed for batch use
    * and tests). Returns the admitted rows AFTER appending them to
    * `corpusPath`. */
  def admitBatch(batch: DataFrame, corpusPath: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    // within-batch near-dup collapse (pairs → components → keep one)
    val pairs = Dedup.jaccardPairs(batch, idCol, textCol, shingleK, threshold)
    val selfDeduped = Dedup.keepOnePerCluster(batch, pairs, idCol)

    // only a genuinely absent corpus means "first batch" — any other
    // read failure (corrupt footer, transient IO) must propagate, not
    // silently disable the dedup check and pollute the corpus
    val cPath = new org.apache.hadoop.fs.Path(corpusPath)
    val corpusExists = cPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(cPath)

    val admitted = (if (corpusExists) {
      val c = spark.read.parquet(corpusPath)
      val dups = Dedup
        .crossJaccardPairs(c, selfDeduped, idCol, textCol, shingleK, threshold)
        .select(col("batch_id").as(idCol)).distinct()
      selfDeduped.join(dups, Seq(idCol), "left_anti")
    } else selfDeduped)
      // eager, lineage-breaking materialization BEFORE the append. Not
      // persist(): writing to corpusPath refreshes every cached plan
      // that reads it, so a persisted result would be invalidated by
      // our own append and re-executed against the corpus-with-batch —
      // where each admitted doc matches itself and vanishes. The
      // checkpointed RDD has no file-source lineage, so the append can
      // neither invalidate nor recompute it (and callers don't re-run
      // the dedup cascade either).
      .localCheckpoint()
    admitted.write.mode("append").parquet(corpusPath)
    admitted
  }

  /** Streaming form: admit each micro-batch into the corpus at
    * `corpusPath`. Checkpointed source offsets give at-least-once
    * batch delivery; [[admitBatch]]'s self-match property upgrades
    * admission to effectively-once. */
  def dedupAdmission(docs: DataFrame, corpusPath: String, checkpoint: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     shingleK: Int = 3, threshold: Double = 0.5,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, corpusPath, idCol, textCol, shingleK, threshold)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Streaming admission through a MATERIALIZED shingle index
    * ([[IndexedCorpus]]) — postings land once at admission and each
    * batch probes only the index buckets it touches, replacing the
    * per-batch corpus scan + shingle explode; the micro-batch id is
    * fenced in the corpus manifest, so replays admit nothing (exactly-
    * once admission, strictly stronger than the self-match masking of
    * [[dedupAdmission]]). */
  def dedupAdmissionIndexed(docs: DataFrame, corpus: IndexedCorpus,
                            checkpoint: String, threshold: Double = 0.5,
                            trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        corpus.admit(batch, batchId, threshold)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
