package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{FakeDecoder, Multimodal, PortableDecoder}
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
             |ORDER BY media_id""".stripMargin)),

    // ---- REAL decode, no codec libs: PortableDecoder parses actual
    // ---- P6 / concatenated-P6 / PCM-WAV containers synthesized from
    // ---- pure id functions — the oracle re-derives every header field
    // ---- ARITHMETICALLY (header length via string length), so a pass
    // ---- proves the parser inverts the synthesis end-to-end ----------
    Q("q102_media_real_decode",
      (s, dir) => Multimodal.decodeAll(
          Multimodal.synthesizePortable(Tables.load(s, dir, "documents")),
          PortableDecoder)
        .toDF()
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sampleRate").as("sample_rate"),
          col("meta.nFrames").as("n_frames"),
          col("n_bytes"), col("meta.ok").as("ok"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 4 + doc_id % 13 WHEN 2 THEN 8 ELSE 0 END AS INTEGER) AS width,
             |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 4 + doc_id % 11 WHEN 2 THEN 8 ELSE 0 END AS INTEGER) AS height,
             |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 1 THEN 8000 + (doc_id % 8) * 1000 ELSE 0 END AS INTEGER) AS sample_rate,
             |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 1
             |       WHEN 1 THEN 500 + doc_id % 250
             |       ELSE 2 + (doc_id // 3) % 3 END AS INTEGER) AS n_frames,
             |  CAST(CASE CAST(doc_id % 3 AS INTEGER)
             |       WHEN 0 THEN LENGTH('P6' || chr(10) || CAST(4 + doc_id % 13 AS VARCHAR)
             |         || ' ' || CAST(4 + doc_id % 11 AS VARCHAR) || chr(10) || '255' || chr(10))
             |         + 3 * (4 + doc_id % 13) * (4 + doc_id % 11)
             |       WHEN 1 THEN 44 + 2 * (500 + doc_id % 250)
             |       ELSE (2 + (doc_id // 3) % 3)
             |         * (LENGTH('P6' || chr(10) || '8 8' || chr(10) || '255' || chr(10)) + 192)
             |       END AS INTEGER) AS n_bytes,
             |  TRUE AS ok
             |FROM documents
             |ORDER BY media_id""".stripMargin)),

    // ---- REAL BMP decode (round 8): classic BITMAPFILEHEADER +
    // ---- BITMAPINFOHEADER, uncompressed 24-bit, 4-byte-padded rows —
    // ---- the second codec-free still format. The oracle re-derives
    // ---- width, height and the padded byte count arithmetically
    // ---- (54 + ceil(3w/4)·4·h), so a pass proves the BMP chunk walk
    // ---- inverts the synthesis, including the row-padding math ------
    Q("q103_media_bmp_decode",
      (s, dir) => Multimodal.decodeAll(
          Multimodal.synthesizeBmp(Tables.load(s, dir, "documents")),
          PortableDecoder)
        .toDF()
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.nFrames").as("n_frames"),
          col("n_bytes"), col("meta.ok").as("ok"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, 'image' AS kind,
             |  CAST(4 + doc_id % 9 AS INTEGER) AS width,
             |  CAST(4 + doc_id % 7 AS INTEGER) AS height,
             |  CAST(1 AS INTEGER) AS n_frames,
             |  CAST(54 + (((4 + doc_id % 9) * 3 + 3) // 4) * 4
             |    * (4 + doc_id % 7) AS INTEGER) AS n_bytes,
             |  TRUE AS ok
             |FROM documents
             |ORDER BY media_id""".stripMargin))
  )
}
