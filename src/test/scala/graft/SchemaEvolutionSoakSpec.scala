package graft

import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.cdc.DeletePolicy
import graft.sources.CdcSource
import graft.streaming.{CdcPipeline, PipelineRegistry, TableCdcConfig}

/** Endurance evidence for schema evolution under the CDC path (the
  * Debezium ALTER TABLE ADD COLUMN firehose — the reference's secure
  * connector captures a 42-table surface, `abcsvb-connector-secure
  * .json:57`, where column adds arrive mid-stream as a matter of
  * course). SchemaEvolutionSpec proves one widening once, directly
  * against the state store; this soak drives N epochs of envelope
  * batches through the WHOLE `CdcPipeline` (file stream → decode →
  * L1 raw archive + L2 versioned upsert), restarting the pipeline per
  * epoch on the same checkpoints like a redeployed connector, with:
  *
  *  - two mid-soak widenings (add `b`, then add `c`) of the landing
  *    `rowSchema`;
  *  - ALTERNATING batch widths after each widening — old-width
  *    producers keep publishing (the Debezium reality: the landing
  *    DDL is altered before every producer restarts);
  *  - ~10% deletes (tombstone path) and ~10% LATE events (stale
  *    version, must lose) in every epoch.
  *
  * After EVERY epoch the L2 state must equal the driver-tracked
  * oracle under whole-row last-writer-wins: the winning event's
  * absent columns read back NULL (row replacement, not column merge —
  * ReplacingMergeTree semantics), deletes stay hidden, late events
  * never clobber. At the end, the L1 archive holds exactly one row
  * per envelope ever published.
  *
  * `SPARK_GRAFT_EVOLVE_EPOCHS` overrides the epoch count (dev loop).
  */
class SchemaEvolutionSoakSpec extends SparkSpec {
  import spark.implicits._

  private val nEpochs =
    sys.env.getOrElse("SPARK_GRAFT_EVOLVE_EPOCHS", "24").toInt

  private def schemaOf(width: Int): StructType = StructType(
    Seq(StructField("id", IntegerType), StructField("a", StringType)) ++
      (if (width >= 2) Seq(StructField("b", StringType)) else Nil) ++
      (if (width >= 3) Seq(StructField("c", StringType)) else Nil))

  private def rowJson(id: Int, width: Int, ver: Long): String =
    (Seq(s""""id":$id""", s""""a":"a$ver"""") ++
      (if (width >= 2) Seq(s""""b":"b$ver"""") else Nil) ++
      (if (width >= 3) Seq(s""""c":"c$ver"""") else Nil))
      .mkString("{", ",", "}")

  private def envelope(id: Int, width: Int, ver: Long, op: String): String = {
    val row = rowJson(id, width, ver)
    val (before, after) =
      if (op == "d") (row, "null") else ("null", row)
    s"""{"payload":{"before":$before,"after":$after,""" +
      s""""source":{"ts_ms":$ver,"lsn":$ver,"db":"poc",""" +
      s""""schema":"public","table":"soak"},"op":"$op",""" +
      s""""ts_ms":$ver,"transaction":null}}"""
  }

  // landing-schema width per epoch: ALTER ADD b at 1/4 of the soak,
  // ALTER ADD c at 7/12 (6 and 14 for the default 24)
  private def configWidth(epoch: Int): Int =
    if (epoch < nEpochs / 4) 1
    else if (epoch < (nEpochs * 7) / 12) 2 else 3

  test(s"$nEpochs-epoch widen/narrow/delete soak through CdcPipeline: " +
      "LWW + null-fill at every epoch") {
    val base = tmpDir("graft-evsoak")
    val src = tmpDir("graft-evsoak-src")
    val rng = new scala.util.Random(20260816L)
    val keyspace = 150

    // oracle: id -> (version, width of winning event, deleted)
    val expect = scala.collection.mutable.Map.empty[Int, (Long, Int, Boolean)]
    var ver = 0L
    var published = 0L

    for (epoch <- 0 until nEpochs) {
      val width = configWidth(epoch)
      // alternating batch width: odd epochs after a widening still
      // carry old-width events (producers not yet restarted)
      val evtWidth = if (epoch % 2 == 1) math.max(1, width - 1) else width
      val batch = (0 until 40).map { _ =>
        val id = rng.nextInt(keyspace)
        val late = expect.contains(id) && rng.nextInt(10) == 0
        if (late) {
          // stale version (odd, strictly below the id's current even
          // version): must lose; oracle unchanged
          envelope(id, evtWidth, expect(id)._1 - 1, "u")
        } else {
          ver += 2
          val del = rng.nextInt(10) == 0
          expect(id) = (ver, evtWidth, del)
          envelope(id, evtWidth, ver, if (del) "d" else "u")
        }
      }
      published += batch.size
      batch.toDF("value").repartition(1).write.mode("append").json(src)

      // redeployed connector: fresh registry, same checkpoints/state
      val config = TableCdcConfig(table = "public.soak",
        topicPrefix = "poc", rowSchema = schemaOf(width),
        keys = Seq("id"), deletePolicy = DeletePolicy.Apply)
      val running = CdcPipeline.start(spark, config,
        CdcSource.fileStream(spark, src), base, new PipelineRegistry)
      running.raw.foreach(_.awaitTermination())
      running.typed.foreach(_.awaitTermination())

      // EVERY epoch: visible state == oracle under whole-row LWW
      val got = running.store.get.read(spark).get
      val cols = got.columns.toSet
      val rows = got.collect().map { r =>
        def f(c: String): String =
          if (cols(c)) r.getAs[String](c) else null
        r.getAs[Int]("id") -> ((f("a"), f("b"), f("c")))
      }.toMap
      val want = expect.collect {
        case (id, (v, w, deleted)) if !deleted =>
          id -> ((s"a$v", if (w >= 2) s"b$v" else null,
            if (w >= 3) s"c$v" else null))
      }.toMap
      assert(rows == want,
        s"epoch $epoch (width $width, events $evtWidth): state diverged — " +
          s"${(rows.keySet -- want.keySet).size} extra, " +
          s"${(want.keySet -- rows.keySet).size} missing, " +
          (want.keySet & rows.keySet).filter(k => want(k) != rows(k)).take(3)
            .map(k => s"$k: want ${want(k)} got ${rows(k)}").mkString("; "))
    }

    // L1 archive: exactly one row per envelope ever published
    val rawN = spark.read.parquet(s"$base/public_soak/raw").count()
    assert(rawN == published,
      s"raw archive $rawN rows != $published published envelopes")
  }
}
