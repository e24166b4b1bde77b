package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetStateStore

/** Additive schema evolution in the keyed state store: a batch
  * carrying a new column (the Debezium ALTER TABLE ADD COLUMN path)
  * widens the state in place — old rows null-fill, buckets written
  * before the widening still surface the column on read, and
  * last-writer-wins stays correct across the width change. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("new column widens state; untouched buckets read back null-filled") {
    val store = new ParquetStateStore(tmpDir("graft-evolve"),
      keys = Seq("id"), versionCols = Seq("ts"), buckets = 4)

    // generation 1: narrow schema, keys spread across buckets
    store.merge((1L to 20L).map(i => (i, 1L, s"a$i")).toDF("id", "ts", "val_a"))

    // generation 2: source added `val_b`; the batch touches only SOME
    // keys (hence some buckets) — untouched buckets keep their narrow
    // files and must still read with the new column
    store.merge(Seq(
      (1L, 2L, "a1x", "b1"),
      (2L, 2L, "a2x", "b2")).toDF("id", "ts", "val_a", "val_b"))

    val got = store.read(spark).get
    assert(got.columns.toSet == Set("id", "ts", "val_a", "val_b"))
    val byId = got.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("val_a"), r.getAs[String]("val_b"))).toMap
    assert(byId.size == 20)
    assert(byId(1L) == ("a1x", "b1") && byId(2L) == ("a2x", "b2"))
    assert(byId(3L) == ("a3", null), "old rows must null-fill the new column")

    // LWW across the width change: an old-width LATE event must not
    // clobber a newer wide row (version wins, not arrival order or width)
    store.merge(Seq((1L, 1L, "a1-late")).toDF("id", "ts", "val_a"))
    val r1 = store.read(spark).get.where($"id" === 1L).head()
    assert(r1.getAs[String]("val_a") == "a1x" &&
      r1.getAs[String]("val_b") == "b1",
      "late narrow event out-versioned by the wide row must lose")
  }

  test("deletes and tombstone retention work across the width change") {
    val store = new ParquetStateStore(tmpDir("graft-evolve-del"),
      keys = Seq("id"), versionCols = Seq("ts"),
      deletedCol = Some("__deleted"), buckets = 2)
    store.merge(Seq((1L, 1L, "x", false), (2L, 1L, "y", false))
      .toDF("id", "ts", "v", "__deleted"))
    // widened batch deletes key 1
    store.merge(Seq((1L, 2L, "x", "extra", true))
      .toDF("id", "ts", "v", "v2", "__deleted"))
    val visible = store.read(spark).get.select("id").as[Long].collect().toSet
    assert(visible == Set(2L))
    // tombstone retained at the new width
    val all = store.readWithTombstones(spark).get
    assert(all.where($"id" === 1L).head().getAs[Boolean]("__deleted"))
  }
}
