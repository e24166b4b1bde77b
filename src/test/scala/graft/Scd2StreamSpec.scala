package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Versioned
import graft.streaming.Scd2Stream

/** Streaming SCD2: the incremental history must equal the batch
  * [[Versioned.scd2History]] replay after every micro-batch prefix —
  * plus fence/replay idempotence and delete-then-reopen semantics. */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Int, Long, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "ts", "op", "payload")

  /** history ∪ open, projected to the batch operator's shape. */
  private def streamedView(state: graft.streaming.ParquetStateStore,
                           hist: String): DataFrame =
    Scd2Stream.fullHistory(spark, state, hist, Seq("ts")).get
      .select($"id", $"ts", $"payload", $"valid_from", $"valid_to", $"is_current")

  private def batchView(all: DataFrame): DataFrame =
    Versioned.scd2History(all, Seq("id"), Seq("ts"), "op")
      .select($"id", $"ts", $"payload", $"valid_from", $"valid_to", $"is_current")

  test("incremental == batch replay after every micro-batch prefix") {
    val root = tmpDir("graft-scd2")
    val state = Scd2Stream.openStore(s"$root/state", Seq("id"), Seq("ts"), buckets = 4)
    val b1 = ev((1, 10L, "r", "a1"), (2, 10L, "r", "b1"), (3, 10L, "r", "c1"))
    val b2 = ev((1, 20L, "u", "a2"), (3, 15L, "d", null.asInstanceOf[String]))
    val b3 = ev((1, 30L, "u", "a3"), (3, 40L, "r", "c2"), (4, 40L, "r", "d1"))

    Scd2Stream.applyBatch(b1, 0L, state, s"$root/hist", Seq("id"), Seq("ts"), "op")
    assertSameRows(streamedView(state, s"$root/hist"), batchView(b1))

    Scd2Stream.applyBatch(b2, 1L, state, s"$root/hist", Seq("id"), Seq("ts"), "op")
    assertSameRows(streamedView(state, s"$root/hist"),
      batchView(b1.unionByName(b2)))

    Scd2Stream.applyBatch(b3, 2L, state, s"$root/hist", Seq("id"), Seq("ts"), "op")
    val all = b1.unionByName(b2).unionByName(b3)
    assertSameRows(streamedView(state, s"$root/hist"), batchView(all))

    // key 3 was hard-deleted then re-opened: exactly one current row at ts=40
    val k3 = streamedView(state, s"$root/hist").where($"id" === 3)
      .select($"valid_from", $"is_current").as[(Long, Boolean)].collect().toSet
    assert(k3 == Set((10L, false), (40L, true)), k3.toString)
  }

  test("replayed batch is idempotent (fence + history overwrite)") {
    val root = tmpDir("graft-scd2r")
    val state = Scd2Stream.openStore(s"$root/state", Seq("id"), Seq("ts"), buckets = 4)
    val b1 = ev((1, 10L, "r", "a1"), (1, 20L, "u", "a2"))
    Scd2Stream.applyBatch(b1, 0L, state, s"$root/hist", Seq("id"), Seq("ts"), "op")
    val before = streamedView(state, s"$root/hist").collect().toSet
    // crash-replay: same batch id re-applied verbatim
    Scd2Stream.applyBatch(b1, 0L, state, s"$root/hist", Seq("id"), Seq("ts"), "op")
    assert(streamedView(state, s"$root/hist").collect().toSet == before)
  }

  test("event redelivered in a LATER batch does not emit zero-length intervals") {
    val root = tmpDir("graft-scd2d")
    val state = Scd2Stream.openStore(s"$root/state", Seq("id"), Seq("ts"), buckets = 4)
    val b1 = ev((1, 10L, "r", "a1"), (1, 20L, "u", "a2"))
    val b2 = ev((1, 20L, "u", "a2"), (1, 30L, "u", "a3")) // (1,20) redelivered
    Scd2Stream.applyBatch(b1, 0L, state, s"$root/hist", Seq("id"), Seq("ts"), "op")
    Scd2Stream.applyBatch(b2, 1L, state, s"$root/hist", Seq("id"), Seq("ts"), "op")
    val want = batchView(ev((1, 10L, "r", "a1"), (1, 20L, "u", "a2"),
      (1, 30L, "u", "a3")))
    assertSameRows(streamedView(state, s"$root/hist"), want)
  }

  test("same-instant changes survive via the orderCols tie-break") {
    val root = tmpDir("graft-scd2t")
    val state = Scd2Stream.openStore(s"$root/state", Seq("id"),
      Seq("ts", "lsn"), buckets = 4)
    val b1 = Seq((1, 10L, 1L, "r", "a1"), (1, 10L, 2L, "u", "a2"))
      .toDF("id", "ts", "lsn", "op", "payload")
    Scd2Stream.applyBatch(b1, 0L, state, s"$root/hist", Seq("id"),
      Seq("ts", "lsn"), "op")
    val got = Scd2Stream.fullHistory(spark, state, s"$root/hist", Seq("ts"))
      .get.select($"payload", $"is_current").as[(String, Boolean)]
      .collect().toMap
    // both events kept: lsn=1 closed by lsn=2, lsn=2 current
    assert(got == Map("a1" -> false, "a2" -> true), got.toString)
  }

  test("a batch id BEHIND the fence fails loudly (checkpoint reset)") {
    val root = tmpDir("graft-scd2f")
    val state = Scd2Stream.openStore(s"$root/state", Seq("id"), Seq("ts"), buckets = 4)
    Scd2Stream.applyBatch(ev((1, 10L, "r", "a1")), 5L, state,
      s"$root/hist", Seq("id"), Seq("ts"), "op")
    intercept[IllegalArgumentException] {
      Scd2Stream.applyBatch(ev((2, 10L, "r", "b1")), 3L, state,
        s"$root/hist", Seq("id"), Seq("ts"), "op")
    }
  }

  test("streaming e2e over a json file source") {
    val root = tmpDir("graft-scd2s")
    val src = tmpDir("graft-scd2s-src")
    val state = Scd2Stream.openStore(s"$root/state", Seq("id"), Seq("ts"), buckets = 4)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("ts", LongType),
      StructField("op", StringType), StructField("payload", StringType)))

    def land(name: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(src, name)
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes)
      ()
    }
    land("f1.json", Seq(
      """{"id":1,"ts":10,"op":"r","payload":"a1"}""",
      """{"id":1,"ts":20,"op":"u","payload":"a2"}""",
      """{"id":2,"ts":10,"op":"r","payload":"b1"}"""))
    val q = Scd2Stream.sink(
      spark.readStream.schema(schema).json(src),
      state, s"$root/hist", Seq("id"), Seq("ts"), "op", s"$root/cp")
    q.awaitTermination(60000)

    val got = streamedView(state, s"$root/hist")
    val want = batchView(ev((1, 10L, "r", "a1"), (1, 20L, "u", "a2"),
      (2, 10L, "r", "b1")))
    assertSameRows(got, want)

    // restart with one more file: checkpoint resumes, history extends
    land("f2.json", Seq("""{"id":2,"ts":30,"op":"d","payload":null}"""))
    val q2 = Scd2Stream.sink(
      spark.readStream.schema(schema).json(src),
      state, s"$root/hist", Seq("id"), Seq("ts"), "op", s"$root/cp")
    q2.awaitTermination(60000)
    val want2 = batchView(ev((1, 10L, "r", "a1"), (1, 20L, "u", "a2"),
      (2, 10L, "r", "b1"), (2, 30L, "d", null.asInstanceOf[String])))
    assertSameRows(streamedView(state, s"$root/hist"), want2)
  }
}
