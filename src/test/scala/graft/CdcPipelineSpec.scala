package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcSim
import graft.sources.Tables

/** Flagship pipeline (§3.1) self-oracle: the JSON envelope roundtrip
  * must land exactly the state computed relationally (no JSON) from the
  * same rules. */
class CdcPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("currentState through JSON == relational recomputation") {
    val orders = Tables.load(spark, sfDir, "orders")
    val viaJson = CdcSim.currentState(CdcSim.orderEnvelopes(orders))
      .select("id", "customer_id", "status", "total_amount")

    val expected = orders
      .where($"o_orderkey" % 7 =!= 0)
      .select(
        $"o_orderkey".cast("int").as("id"),
        $"o_custkey".cast("int").as("customer_id"),
        when($"o_orderkey" % 3 === 0, "updated").otherwise($"o_orderstatus")
          .as("status"),
        $"o_totalprice".cast("decimal(12,2)").cast("string").as("total_amount"))

    assertSameRows(viaJson, expected)
  }

  test("scrambled arrival order lands the same state") {
    val orders = Tables.load(spark, sfDir, "orders").limit(300)
    val env = CdcSim.orderEnvelopes(orders)
    val scrambled = env.orderBy(xxhash64($"value"))  // deterministic shuffle
    assertSameRows(
      CdcSim.currentState(env).select("id", "status"),
      CdcSim.currentState(scrambled).select("id", "status"))
  }
}
