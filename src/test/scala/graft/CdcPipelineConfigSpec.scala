package graft

import org.apache.spark.sql.functions._

import graft.cdc.{CdcSim, DeletePolicy}
import graft.sources.Tables
import graft.streaming.{CdcPipeline, PipelineRegistry, TableCdcConfig}

/** One config → the whole per-table landing stack (L1 + L2), like one
  * connector entry + its ClickHouse DDL in the reference. */
class CdcPipelineConfigSpec extends SparkSpec {
  import spark.implicits._

  test("config-driven pipeline lands raw archive and current state") {
    val base = tmpDir("graft-cfg")
    val src = tmpDir("graft-cfgsrc")
    val orders = Tables.load(spark, sfDir, "orders").limit(300)
    val env = CdcSim.orderEnvelopes(orders).select("value")
    env.repartition(3).write.mode("overwrite").json(src)

    val config = TableCdcConfig(
      table = "public.orders",
      topicPrefix = "poc",
      rowSchema = CdcSim.ordersRow,
      keys = Seq("id"),
      deletePolicy = DeletePolicy.Apply,
      maskFields = Seq("priority"))
    assert(config.topic == "poc.public.orders")

    val reg = new PipelineRegistry
    val running = CdcPipeline.start(spark, config,
      graft.sources.CdcSource.fileStream(spark, src), base, reg)
    running.raw.get.awaitTermination()
    running.typed.get.awaitTermination()

    // L1: every envelope archived
    val rawN = spark.read.parquet(s"$base/public_orders/raw").count()
    assert(rawN == env.count())

    // L2: current state == the flagship batch pipeline, with masking
    val got = running.store.get.read(spark).get
    val expected = CdcSim.currentState(CdcSim.orderEnvelopes(orders))
    assert(got.count() == expected.count())
    assert(got.select("priority").distinct().as[String].collect()
      .sameElements(Array("")))      // U2 masking applied
    assertSameRows(got.select("id", "status"),
      expected.select("id", "status"))
  }
}
