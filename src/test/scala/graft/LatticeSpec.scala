package graft

import org.apache.spark.sql.functions._

import graft.operators.Lattice

/** The driver-lattice guards must fail LOUDLY on cardinality
  * surprises: an input that outgrows its documented key-space bound
  * aborts with the bound's name, instead of OOMing the driver or
  * silently single-task-sorting a huge relation. */
class LatticeSpec extends SparkSpec {
  import spark.implicits._

  test("collectBounded returns the lattice when inside the bound") {
    val rows = Lattice.collectBounded(
      (1 to 40).toDF("k"), 100, "test 40-row lattice")
    assert(rows.length == 40)
  }

  test("collectBounded fails fast on an over-cardinality input") {
    val e = intercept[IllegalArgumentException] {
      Lattice.collectBounded(
        spark.range(10000).toDF("k"), 100, "test overflow lattice")
    }
    assert(e.getMessage.contains("test overflow lattice"))
  }

  test("checkpointBounded blesses the materialized RDD for the audit") {
    val df = Lattice.checkpointBounded(
      (1 to 12).toDF("m").groupBy("m").count(), 100, "test month grid")
    val ids = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(ids.nonEmpty && ids.forall(Lattice.isBounded))
    assert(df.count() == 12)
  }

  test("checkpointBounded rejects an over-cardinality lattice") {
    val e = intercept[IllegalArgumentException] {
      Lattice.checkpointBounded(spark.range(500).toDF("k"), 100,
        "test overflow grid")
    }
    assert(e.getMessage.contains("test overflow grid"))
  }
}
