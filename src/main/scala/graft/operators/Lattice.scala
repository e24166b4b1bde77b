package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row}

/** Loud cardinality bounds for lattice-grain intermediates.
  *
  * Several queries materialize a small frame whose size is bounded by a
  * KEY SPACE (months × segments, k centroids, event-type pairs) rather
  * than by data volume, then either iterate over it on the driver or
  * sort it in a single window partition. Both moves are correct ONLY
  * while the bound holds — and a silent cardinality surprise at a larger
  * scale factor would OOM the driver or single-task a huge sort instead
  * of failing with a diagnosis. Every such site goes through this object
  * so the bound is (a) asserted at runtime with the documented reason,
  * and (b) visible to the plan audit (`WindowAuditSpec` treats only
  * RDDs blessed here as aggregate-grain once a checkpoint has hidden
  * the bounding Aggregate behind a LogicalRDD).
  */
object Lattice {

  /** Default ceiling for "driver-sized": far above any real lattice in
    * this engine (the largest is the ~84-month × segment grid) and far
    * below anything that could hurt a driver. */
  val MaxDriverRows = 100000L

  private val blessed = ConcurrentHashMap.newKeySet[Int]()

  /** Eagerly materialize a lattice-grain frame (the localCheckpoint
    * keeps multi-consumer plans from recomputing it), asserting its
    * cardinality bound. `why` documents the key space that bounds it. */
  def checkpointBounded(df: DataFrame, maxRows: Long, why: String): DataFrame = {
    val out = df.localCheckpoint(true)
    val n = out.count()
    require(n <= maxRows,
      s"lattice '$why' overflowed its documented bound: $n > $maxRows rows; " +
        "this frame is about to be single-task sorted or driver-iterated — " +
        "revisit the bound argument before raising it")
    // register the checkpoint's INTERNAL RDD (the one the LogicalRDD
    // leaf carries — `df.rdd` would be a derived external-row RDD with
    // a different id, invisible to plan inspection)
    out.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => blessed.add(l.rdd.id)
    }
    // The checkpointed LogicalRDD inherits its ORIGIN plan's size
    // estimate, not its actual (asserted-tiny) cardinality — a lattice
    // whose upstream estimate exceeds autoBroadcastJoinThreshold turns
    // every downstream non-equi join into a CartesianProduct (observed:
    // q299's 10-row bin table carried a 17 MB estimate → 12k cartesian
    // tasks, +8 s). The row bound was JUST asserted, so a broadcast
    // hint is always truthful here.
    org.apache.spark.sql.functions.broadcast(out)
  }

  /** Collect a driver-iterated lattice, asserting the bound FIRST so an
    * over-cardinality input fails fast instead of OOMing the driver. */
  def collectBounded(df: DataFrame, maxRows: Long, why: String): Array[Row] = {
    val rows = df.limit(maxRows.toInt + 1).collect()
    require(rows.length <= maxRows,
      s"driver lattice '$why' overflowed its documented bound " +
        s"(> $maxRows rows); refusing to collect an unbounded relation")
    rows
  }

  /** Was this RDD id materialized through [[checkpointBounded]]? */
  def isBounded(rddId: Int): Boolean = blessed.contains(rddId)
}
