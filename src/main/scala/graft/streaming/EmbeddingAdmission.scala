package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup
import graft.sim.Similarity

/** Streaming embedding-dedup admission — [[AdmissionGate]]'s analog
  * for the vector modality: a micro-batch of embeddings is near-dup
  * collapsed within itself (LSH pairs → connected components → keep
  * the min-id representative), checked against the standing corpus
  * through [[Similarity.crossNearDupPairs]], and only vectors with no
  * near-duplicate already admitted are appended.
  *
  * Scale shape: the corpus side is one parquet scan per batch with LSH
  * bucket ids computed in the projection and the (small) batch
  * broadcast — no corpus shuffle, no corpus self-join; rescoring only
  * touches bucket-mates. At 100 TB the corpus bucket rows are a
  * materialized index maintained at admission (the [[IndexedCorpus]]
  * pattern), which changes the scan constant, not the join shape.
  *
  * Replay safety: identical to [[AdmissionGate]] — admission is
  * naturally idempotent because an already-admitted vector matches
  * itself at cosine 1.0 ≥ any threshold ≤ 1, so a replayed batch
  * re-admits nothing. */
object EmbeddingAdmission {

  /** One admission round (the foreachBatch body, exposed for batch use
    * and tests). Returns the admitted rows AFTER appending them to
    * `corpusPath`. */
  def admitBatch(batch: DataFrame, corpusPath: String,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 threshold: Double = 0.9, bits: Int = 4,
                 tables: Int = 8): DataFrame = {
    // strict: at exactly 1.0 a replayed vector's float self-cosine can
    // round to 0.99999999999999989 < threshold and slip past the mask —
    // exact-duplicate gating belongs to hash dedup, not a cosine gate
    require(threshold < 1.0,
      s"threshold must be < 1 for replay idempotence (self-match masking): $threshold")
    val spark = batch.sparkSession
    // within-batch near-dup collapse (pairs → components → keep one)
    val pairs = Similarity.nearDupPairs(batch, threshold, bits, tables,
      idCol, vecCol)
    val selfDeduped = Dedup.keepOnePerCluster(batch, pairs, idCol)

    // a genuinely absent corpus means "first batch"; any other read
    // failure must propagate, not silently disable the check
    val cPath = new org.apache.hadoop.fs.Path(corpusPath)
    val corpusExists = cPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(cPath)

    val admitted = (if (corpusExists) {
      val c = spark.read.parquet(corpusPath)
      val dups = Similarity
        .crossNearDupPairs(c, selfDeduped, threshold, bits, tables,
          idCol, vecCol)
        .select(col("batch_id").as(idCol)).distinct()
      selfDeduped.join(dups, Seq(idCol), "left_anti")
    } else selfDeduped)
      // lineage-breaking materialization BEFORE the append (same
      // rationale as AdmissionGate.admitBatch: our own append would
      // invalidate a persisted plan reading corpusPath, and the
      // re-executed check would self-match every admitted vector away)
      .localCheckpoint()
    admitted.write.mode("append").parquet(corpusPath)
    admitted
  }

  /** Streaming form: admit each micro-batch of embeddings into the
    * corpus at `corpusPath`. Checkpointed source offsets give
    * at-least-once batch delivery; [[admitBatch]]'s self-match property
    * upgrades admission to effectively-once. */
  def nearDupAdmission(vectors: DataFrame, corpusPath: String,
                       checkpoint: String,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       threshold: Double = 0.9, bits: Int = 4,
                       tables: Int = 8,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, corpusPath, idCol, vecCol, threshold, bits, tables)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** [[nearDupAdmission]] against a MATERIALIZED signature index
    * ([[IndexedVectorCorpus]]) — signatures land once at admission and
    * each batch probes only the index partitions its buckets hash
    * into; the fence makes replays exactly-once (no reliance on
    * self-match masking). */
  def nearDupAdmissionIndexed(vectors: DataFrame, corpus: IndexedVectorCorpus,
                              checkpoint: String, threshold: Double = 0.9,
                              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        corpus.admit(batch, batchId, threshold)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
