package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.streaming.{ArchiveCompactor, Sinks}

/** L1 archive compaction: fold per-micro-batch small files into
  * clustered parts without touching the sink's `_spark_metadata` log;
  * content is invariant through compact → incremental compact → expire
  * → part merge (SURVEY §2.8 storage maintenance; the reference's
  * MergeTree background merges). */
class ArchiveCompactionSpec extends SparkSpec {

  private val valueSchema = StructType(Seq(StructField("value", StringType)))

  /** `parts` json files of synthetic messages [from, to). */
  private def writeBatch(src: String, from: Long, to: Long, parts: Int): Unit =
    spark.range(from, to)
      .select(concat(lit("{\"v\":"), col("id").cast("string"), lit("}"))
        .as("value"))
      .repartition(parts).write.mode("append").json(src)

  /** Run the archive sink to completion over whatever is unprocessed,
    * one source file per micro-batch (forces one small file each). */
  private def drain(src: String, sink: String, cp: String): Unit = {
    val raw = spark.readStream.schema(valueSchema)
      .option("maxFilesPerTrigger", 1).json(src)
    Sinks.rawArchive(raw, sink, cp).awaitTermination()
  }

  private def parquetFiles(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted

  test("compaction folds small files into one clustered part, content-invariant") {
    val src = tmpDir("graft-ac-src"); val sink = tmpDir("graft-ac-sink") + "/data"
    val cp = tmpDir("graft-ac-cp")
    writeBatch(src, 0, 400, parts = 6)
    drain(src, sink, cp)

    val before = parquetFiles(sink)
    assert(before.size >= 6, s"expected >=6 micro-batch files, got ${before.size}")
    val raw = spark.read.parquet(sink)

    val c = new ArchiveCompactor(sink, tmpDir("graft-ac-z"),
      clusterCols = Seq("value"), targetBytes = 1L << 30)
    val folded = c.compact(spark, smallBytes = 1L << 30)
    assert(folded == before.size, s"folded $folded of ${before.size}")
    assert(parquetFiles(c.compactPath + "/p0").size == 1,
      "one target-size output file expected")
    assertSameRows(c.read(spark), raw)

    // incremental: a second run folds ONLY the new tail
    writeBatch(src, 400, 600, parts = 3)
    drain(src, sink, cp)
    val after = parquetFiles(sink)
    val folded2 = c.compact(spark, smallBytes = 1L << 30)
    assert(folded2 == after.size - before.size,
      s"second run folded $folded2, expected ${after.size - before.size}")
    assertSameRows(c.read(spark), spark.read.parquet(sink))

    // nothing left to fold → no-op, no new part
    assert(c.compact(spark, smallBytes = 1L << 30) == 0)
    assert(!Files.exists(Paths.get(c.compactPath, "p2")))
  }

  test("crash between part write and manifest swap self-heals") {
    val src = tmpDir("graft-ax-src"); val sink = tmpDir("graft-ax-sink") + "/data"
    val cp = tmpDir("graft-ax-cp")
    writeBatch(src, 0, 300, parts = 4); drain(src, sink, cp)
    val raw = spark.read.parquet(sink)

    val c = new ArchiveCompactor(sink, tmpDir("graft-ax-z"),
      clusterCols = Seq("value"), targetBytes = 1L << 30)
    // simulate a compact() that died after writing its part but before
    // the manifest swap: the next-epoch dir exists with garbage content
    spark.range(5).selectExpr("CAST(id AS STRING) AS value",
        "current_timestamp() AS ingestion_time")
      .write.parquet(c.compactPath + "/p0")

    // a real run overwrites the orphan and commits — no double counting,
    // no garbage rows
    assert(c.compact(spark, smallBytes = 1L << 30) == parquetFiles(sink).size)
    assertSameRows(c.read(spark), raw)
  }

  test("expire reclaims superseded originals; mergeParts bounds part count") {
    val src = tmpDir("graft-ae-src"); val sink = tmpDir("graft-ae-sink") + "/data"
    val cp = tmpDir("graft-ae-cp")
    val c = new ArchiveCompactor(sink, tmpDir("graft-ae-z"),
      clusterCols = Seq("value"), targetBytes = 1L << 30)

    writeBatch(src, 0, 300, parts = 4); drain(src, sink, cp)
    val n1 = parquetFiles(sink).size
    assert(c.compact(spark, smallBytes = 1L << 30) == n1)
    writeBatch(src, 300, 500, parts = 3); drain(src, sink, cp)
    assert(c.compact(spark, smallBytes = 1L << 30) > 0)
    val nCovered = parquetFiles(sink).size  // everything so far superseded
    // an uncompacted tail the expiry must NOT touch
    writeBatch(src, 500, 600, parts = 2); drain(src, sink, cp)

    val expected = c.read(spark).select("value").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq
    assert(expected.size == 600)

    Thread.sleep(200)                       // mtimes strictly before cutoff
    val deleted = c.expire(spark, graceMs = 0L)
    assert(deleted == nCovered, s"expired $deleted, expected $nCovered")
    // superseded originals gone, tail intact
    val remaining = parquetFiles(sink)
    assert(remaining.size == 2, s"only the tail should remain, got $remaining")
    def values() = c.read(spark).select("value").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq
    assert(values() == expected, "content changed across expire")

    // two parts → one merged part; old dirs reclaimed on next expire
    c.mergeParts(spark)
    assert(values() == expected, "content changed across mergeParts")
    Thread.sleep(200)
    val reclaimed = c.expire(spark, graceMs = 0L)
    assert(reclaimed >= 2, s"expected old part dirs reclaimed, got $reclaimed")
    assert(!Files.exists(Paths.get(c.compactPath, "p0")))
    assert(!Files.exists(Paths.get(c.compactPath, "p1")))
    assert(Files.exists(Paths.get(c.compactPath, "p2")))
    assert(values() == expected, "content changed across part reclaim")
  }
}
