package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.streaming.Sessionize

/** Streaming (flatMapGroupsWithState) sessionization must agree with
  * the batch lag+cumsum formulation.
  *
  * The streamed query emits CLOSED sessions; each user's final session
  * stays open in state when the (finite) stream drains — so the batch
  * oracle drops exactly the last session per user. Deterministic: no
  * reliance on wall-clock timeouts.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("streaming closed sessions == batch sessions minus final-open") {
    val src = tmpDir("graft-sess")
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    ev.repartition(4).write.mode("overwrite").parquet(src)

    val streamed = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
      .as[Sessionize.Event]
    val q = Sessionize.streaming(streamed, gapMinutes = 30)
      .toDF()
      .writeStream.format("memory").queryName("sess")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("sess")
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        round($"total_value", 2).as("total_value"))

    val w = Window.partitionBy($"user_id").orderBy($"session_start".desc)
    val expected = Sessionize.batch(ev, gapMinutes = 30)
      .withColumn("_rn", row_number().over(w))
      .where($"_rn" =!= 1)   // the open session never emits
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        round($"total_value", 2).as("total_value"))

    assertSameRows(got, expected)
    assert(got.count() > 0)
  }

  test("event-time timeout: watermark flushes idle sessions deterministically") {
    val src = tmpDir("graft-sess-et")
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    // time-ranged files arriving in ascending order (FileStreamSource
    // orders by modification time, so each quartile is written as its
    // own job): the watermark contract assumes bounded out-of-orderness
    // — randomly ordered batches would make most events late, and late
    // rows are dropped by design
    val w4 = Window.orderBy($"ts", $"event_id")
    val tiled = ev.withColumn("_tile", ntile(4).over(w4))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (1 to 4).foreach { tile =>
      tiled.where($"_tile" === tile).drop("_tile")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(300)
    }
    tiled.unpersist()

    val streamed = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)   // several batches → watermark advances
      .parquet(src)
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize.streamingEventTime(streamed, gapMinutes = 30)
      .toDF()
      .writeStream.format("memory").queryName("sess_et")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"session_start", $"session_end", $"n_events",
        round($"total_value", 2).as("total_value"))
    val got = norm(spark.table("sess_et"))
    val all = norm(Sessionize.batch(ev, gapMinutes = 30))
    val w = Window.partitionBy($"user_id").orderBy($"session_start".desc)
    val nonFinal = norm(Sessionize.batch(ev, gapMinutes = 30)
      .withColumn("_rn", row_number().over(w)).where($"_rn" =!= 1))

    // sound: nothing emitted that batch doesn't produce
    assert(got.exceptAll(all).count() == 0, "streaming emitted a non-batch session")
    // complete up to the watermark: every gap-closed session emitted
    // (final-open sessions may ALSO flush once the watermark passes them
    // — that's the point of the event-time timeout)
    assert(nonFinal.exceptAll(got).count() == 0,
      "a gap-closed session was never flushed")
    assert(got.count() >= nonFinal.count() && got.count() > 0)
  }

  test("batch sessionize agrees with Spark's native session_window") {
    // same semantics up to the boundary convention: Sessionize keeps an
    // event exactly `gap` after its predecessor in-session (`>` test),
    // session_window's range is end-exclusive and would split there. No
    // µs-exact 30-minute gaps exist in the synthetic events, so the two
    // must agree on it exactly — a drift in either implementation shows
    // up as a row diff here.
    val ev = Tables.load(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_id", $"value")
    val ours = graft.streaming.Sessionize.batch(ev, gapMinutes = 30)
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"total_value")
    val native = ev
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("total_value"))
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"total_value")
    assertSameRows(ours, native)
  }
}
