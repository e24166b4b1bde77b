package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG / context-window prep
  * step of an LLM pipeline: split each document into overlapping
  * token windows (size `size`, stride `stride` < size ⇒ overlap
  * size − stride), with a content fingerprint per chunk so chunk
  * tables can be deduplicated / change-detected downstream.
  *
  * Scale shape: a pure per-row `explode` over an arithmetic start
  * sequence — no shuffle, no window function, no state. At 100 TB the
  * operator is map-only; output partitioning follows the input. The
  * md5 fingerprint matches [[graft.dedup.Portable]]'s engine-portable
  * hashing discipline, so the DuckDB oracle replays chunk boundaries
  * AND content hashes exactly.
  *
  * Reference context: the reference stores whole-row documents
  * (basic_example/clickhouse.sql:24-31); chunking is LLM-pipeline
  * mandate surface.
  */
object Chunking {

  /** One row per (doc, chunk): `doc_id, chunk_idx, chunk_tokens,
    * chunk_md5`. Chunk starts are 0, stride, 2·stride, … < n_tokens;
    * the tail chunk may be shorter than `size`. */
  def slidingChunks(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= size, got size=$chunkSize stride=$stride")
    val toks: Column = split(col("text"), " ")
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(chunkSize)).as("chunk"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        size(col("chunk")).cast("int").as("chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
  }

  /** DuckDB mirror of [[slidingChunks]] (documents table). */
  def slidingChunksSql(chunkSize: Int, stride: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, toks, unnest(range(0, len(toks), $stride)) AS start
       |  FROM d
       |)
       |SELECT doc_id,
       |  CAST(start // $stride AS INTEGER) AS chunk_idx,
       |  CAST(len(list_slice(toks, start + 1, start + $chunkSize)) AS INTEGER) AS chunk_tokens,
       |  md5(array_to_string(list_slice(toks, start + 1, start + $chunkSize), ' ')) AS chunk_md5
       |FROM s
       |ORDER BY doc_id, chunk_idx""".stripMargin
}
