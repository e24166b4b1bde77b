package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.ArchiveCompactor

/** Endurance evidence for the L1 raw-archive maintenance claim
  * (`streaming/ArchiveCompactor`): ArchiveCompactionSpec proves each
  * lifecycle step (compact → incremental → merge → expire) once; this
  * soak drives ONE THOUSAND micro-batch appends through the same path —
  * the reference's high-volume raw-archive intent
  * (`large_dbtable_example/init_clickhouse_raw_tables.sql:28-37` keeps
  * every Kafka message in an ordered MergeTree that background-merges
  * parts continuously) — with compaction every 16 batches and
  * merge+expiry every 128, asserting the three things only endurance
  * shows:
  *
  *  1. CONTENT EXACT after 1000 appends: row count, key sum and
  *     distinct-key count of [[ArchiveCompactor.read]] equal the
  *     appended multiset (compaction moves bytes, never rows);
  *  2. BOUNDED storage: after the final compact + mergeParts + expire,
  *     exactly ONE live part remains and ZERO superseded source files —
  *     1000 batches of small files were physically reclaimed, not
  *     leaked;
  *  3. STABLE read latency: the fastest read near the end is within
  *     4× (+0.5 s job-launch floor) of the fastest near the start —
  *     read cost tracks live bytes, not append count (no tail or
  *     manifest growth term).
  *
  * `SPARK_GRAFT_SOAK_BATCHES` overrides the batch count (dev loop).
  */
class ArchiveSoakSpec extends SparkSpec {

  private val nBatches =
    sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "1000").toInt

  private def parquetFiles(dir: String): Seq[String] =
    if (!Files.exists(Paths.get(dir))) Seq.empty
    else Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq

  private def partDirs(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => Paths.get(p).getFileName.toString.matches("p\\d+"))
      .toSeq

  test(s"$nBatches-batch archive soak: exact content, bounded files, " +
      "stable read latency") {
    val sink = tmpDir("graft-asoak") + "/data"
    val zone = tmpDir("graft-asoak-z")
    val c = new ArchiveCompactor(sink, zone, clusterCols = Seq("k"),
      targetBytes = 8L << 20)

    var expectRows = 0L
    var expectSum = 0L
    val readLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (b <- 0 until nBatches) {
      val lo = b * 20L; val hi = lo + 20L
      spark.range(lo, hi)
        .selectExpr("id AS k", "concat('v', id) AS payload")
        .repartition(1).write.mode("append").parquet(sink)
      expectRows += 20
      expectSum += (lo until hi).sum
      // production cadence: fold small files often, restructure rarely
      if (b % 16 == 15) c.compact(spark, smallBytes = 1L << 30)
      if (b % 128 == 127) {
        c.mergeParts(spark)
        c.expire(spark, graceMs = 0L)
      }
      if (b % 100 == 99) {
        val t0 = System.nanoTime()
        c.read(spark).count()
        readLat += (System.nanoTime() - t0) / 1e9
      }
    }
    c.compact(spark, smallBytes = 1L << 30)
    c.mergeParts(spark)
    Thread.sleep(50)   // mtime strictly below the grace-0 cutoff
    c.expire(spark, graceMs = 0L)

    // 1. content exact (count, key sum, key distinctness)
    val agg = c.read(spark)
      .agg(count(lit(1)).as("n"), sum(col("k")).as("s"),
        countDistinct(col("k")).as("d"))
      .head
    assert(agg.getLong(0) == expectRows,
      s"row count ${agg.getLong(0)} != appended $expectRows")
    assert(agg.getLong(1) == expectSum,
      s"key sum ${agg.getLong(1)} != appended $expectSum")
    assert(agg.getLong(2) == expectRows,
      s"distinct keys ${agg.getLong(2)} != $expectRows (rows duplicated)")

    // 2. bounded storage after final maintenance
    val leftoverSrc = parquetFiles(sink)
    val liveParts = partDirs(zone)
    assert(leftoverSrc.isEmpty,
      s"${leftoverSrc.size} superseded source files survived expiry")
    assert(liveParts.size == 1,
      s"expected exactly one live part after mergeParts+expire, " +
        s"got ${liveParts.size}: $liveParts")

    // 3. stable read latency across the soak
    if (readLat.size >= 6) {
      val early = readLat.take(3).min
      val late = readLat.takeRight(3).min
      assert(late <= early * 4 + 0.5,
        s"read latency drifted: early best ${early}s, late best ${late}s " +
          s"(all: ${readLat.map(l => f"$l%.2f").mkString(", ")})")
    }
  }
}
