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

    // ---- batched decode → metadata + features (rows-only; exactness
    // ---- asserted in MultimodalSpec against the fake decoder) --------
    Q("q51_media_decode",
      (s, dir) => Multimodal.decodeAll(media(s, dir), FakeDecoder)
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("meta.width"), col("meta.height"), col("meta.sampleRate"),
          col("meta.nFrames"), element_at(col("features"), 1).as("f0"))
        .orderBy("media_id"),
      None)
  )
}
