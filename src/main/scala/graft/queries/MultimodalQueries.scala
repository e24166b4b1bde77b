package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{FakeDecoder, Multimodal}
import graft.sources.Tables

/** Multimodal-column plumbing queries: opaque binary blobs with typed
  * metadata, batched decode via mapPartitions (decode itself is the
  * deterministic fake — the codec binding point is
  * [[graft.multimodal.NativeDecoder]]). */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.synthesize(Tables.load(s, dir, "documents"))

  val all: Seq[Q] = Seq(

    // ---- binary column + metadata, oracled on byte accounting --------
    Q("q50_media_bytes",
      (s, dir) => media(s, dir)
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(length(col("bytes"))).cast("long").as("total_bytes"),
          max(length(col("bytes"))).as("max_bytes"))
        .orderBy("kind"),
      Some("""SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  COUNT(*) AS n_media,
             |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
             |  CAST(MAX(strlen(text)) AS INTEGER) AS max_bytes
             |FROM documents
             |GROUP BY 1
             |ORDER BY kind""".stripMargin)),

    // ---- batched decode → plumbing + per-kind metadata validity,
    // ---- oracled row-by-row (decode VALUES are splitmix functions of
    // ---- the bytes — engine-specific, asserted exactly in
    // ---- MultimodalSpec; the oracle checks ids, kinds, byte counts,
    // ---- feature arity, and that every decode landed in its kind's
    // ---- legal metadata range) ---------------------------------------
    Q("q51_media_decode",
      (s, dir) => Multimodal.decodeAll(media(s, dir), FakeDecoder)
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          (col("meta.ok") && when(col("kind") === "image",
              col("meta.width").between(64, 1023) &&
                col("meta.height").between(64, 1023) &&
                col("meta.sampleRate") === 0 && col("meta.nFrames") === 1)
            .when(col("kind") === "audio",
              col("meta.width") === 0 && col("meta.height") === 0 &&
                col("meta.sampleRate").between(8000, 47999) &&
                col("meta.nFrames") === 0)
            .otherwise(col("meta.width") === 0 && col("meta.height") === 0 &&
              col("meta.sampleRate") === 0 &&
              col("meta.nFrames").between(1, 3000))).as("decode_ok"),
          size(col("features")).as("n_features"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  CAST(strlen(text) AS INTEGER) AS n_bytes,
             |  TRUE AS decode_ok,
             |  CAST(8 AS INTEGER) AS n_features
             |FROM documents
             |ORDER BY media_id""".stripMargin))
  )
}
