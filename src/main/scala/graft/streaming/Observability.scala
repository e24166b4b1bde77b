package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming pipeline observability — the analog of the reference
  * stack's ops surface (ClickHouse `system.*` tables + Kafka consumer
  * lag): per-micro-batch progress captured from Spark's listener bus
  * and exposed as a queryable DataFrame, so the same engine that runs
  * the pipelines also answers "is ingest keeping up" with a query.
  *
  * Driver-side state is bounded: a ring of the last `capacity`
  * batches across all queries (progress events are tiny — name,
  * counts, durations). At 100 TB the numbers grow, the event rate
  * does not (one event per micro-batch). */
final case class BatchMetric(
    queryName: String, batchId: Long, timestamp: String,
    numInputRows: Long, inputRowsPerSecond: Double,
    processedRowsPerSecond: Double, batchDurationMs: Long)

class BatchMetricsListener(capacity: Int = 1024)
    extends StreamingQueryListener {

  private val buf = new ArrayBuffer[BatchMetric]()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    buf += BatchMetric(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.timestamp,
      p.numInputRows,
      sane(p.inputRowsPerSecond), sane(p.processedRowsPerSecond),
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    if (buf.size > capacity) buf.remove(0, buf.size - capacity)
  }

  private def sane(d: Double): Double =
    if (d.isNaN || d.isInfinite) 0.0 else d

  /** Snapshot of the captured batches as a DataFrame. */
  def metrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized(buf.toSeq).toDF()
  }

  /** Register on the session's listener bus; returns this for chaining.
    * Call `spark.streams.removeListener` with the same instance to
    * detach (test hygiene). */
  def attach(spark: SparkSession): BatchMetricsListener = {
    spark.streams.addListener(this)
    this
  }
}
