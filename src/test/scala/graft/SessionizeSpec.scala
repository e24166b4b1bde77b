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
}
