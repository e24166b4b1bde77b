package graft

import org.apache.spark.sql.functions._

import graft.cdc.{DecodeOptions, DeletePolicy, EnvelopeDecode}
import graft.model.Debezium

/** Envelope decode against golden-shaped events (shape per the
  * reference capture `basic_example/value.json:760-842`; events here
  * are hand-written, not copied). */
class EnvelopeDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def envJson(op: String, before: String, after: String,
                      tsMs: Long, lsn: Long = 1L): String =
    s"""{"payload":{"before":$before,"after":$after,
       |"source":{"version":"2.4.0.Final","connector":"postgresql","name":"poc",
       |"ts_ms":$tsMs,"snapshot":"false","db":"poc","sequence":null,
       |"schema":"public","table":"products","txId":$lsn,"lsn":$lsn,"xmin":null},
       |"op":"$op","ts_ms":$tsMs,"transaction":null}}""".stripMargin.replace("\n", "")

  private val rowA = """{"id":19,"name":"Laptop","category":"tech","description":null,"price":"1999.99","stock_quantity":5,"created_at":"2024-01-01T10:00:00Z","updated_at":"2024-01-01T10:00:00Z"}"""
  private val rowA2 = """{"id":19,"name":"Laptop","category":"tech","description":null,"price":"1799.00","stock_quantity":7,"created_at":"2024-01-01T10:00:00Z","updated_at":"2024-02-01T09:30:00Z"}"""

  private def raw = Seq(
    envJson("r", "null", rowA, 1000L),
    envJson("u", rowA, rowA2, 2000L),
    envJson("d", rowA2, "null", 3000L),
    "{ this is not json",          // broken message (F3)
    """{"payload":null}"""         // tombstone
  ).toDF("value")

  test("decode drops broken messages and tombstones permissively") {
    val decoded = EnvelopeDecode.decode(raw, Debezium.productsRow)
    assert(decoded.count() == 3)
    assert(decoded.select("_env.op").as[String].collect().sorted
      .sameElements(Array("d", "r", "u")))
  }

  test("drop policy removes deletes (JSONHas analog, F1)") {
    val out = EnvelopeDecode.changes(raw, Debezium.productsRow,
      DecodeOptions(deletePolicy = DeletePolicy.Drop))
    assert(out.count() == 2)
    assert(out.where($"__op" === "d").count() == 0)
    val u = out.where($"__op" === "u")
    assert(u.select("price").as[String].head() == "1799.00")
    assert(u.select("__ts_ms").as[Long].head() == 2000L)
  }

  test("rewrite policy keeps deletes with before-image and __deleted flag (U1)") {
    val out = EnvelopeDecode.changes(raw, Debezium.productsRow,
      DecodeOptions(deletePolicy = DeletePolicy.Rewrite))
    assert(out.count() == 3)
    val d = out.where($"__deleted")
    assert(d.count() == 1)
    // delete row resurrects the before-image
    assert(d.select("stock_quantity").as[Int].head() == 7)
  }

  test("masking blanks configured fields post-unwrap (U2)") {
    val out = EnvelopeDecode.changes(raw, Debezium.productsRow,
      DecodeOptions(maskFields = Seq("name", "price")))
    assert(out.select("name").as[String].collect().forall(_ == ""))
    assert(out.select("price").as[String].collect().forall(_ == ""))
    // unmasked fields intact
    assert(out.select("category").as[String].collect().forall(_ == "tech"))
  }

  test("schema evolution: old events parse under an added column, extra wire fields drop") {
    // Debezium emits whatever the source table looks like NOW; the
    // declared rowSchema is the reader's contract. Forward: a reader
    // that adds `warehouse` sees null for events captured before the
    // column existed. Backward: a reader that dropped a column simply
    // never parses it — no failure either way.
    import org.apache.spark.sql.types._
    val evolved = StructType(Debezium.productsRow.fields :+
      StructField("warehouse", StringType))
    val out = EnvelopeDecode.changes(raw, evolved,
      DecodeOptions(deletePolicy = DeletePolicy.Drop))
    assert(out.columns.contains("warehouse"))
    assert(out.select("warehouse").collect().forall(_.isNullAt(0)),
      "pre-evolution events must read the new column as null")
    assert(out.count() == 2)

    // narrowed reader: declares only 3 of the wire's 8 row fields
    val narrowed = StructType(Debezium.productsRow.fields
      .filter(f => Set("id", "name", "price").contains(f.name)))
    val slim = EnvelopeDecode.changes(raw, narrowed,
      DecodeOptions(deletePolicy = DeletePolicy.Drop))
    assert(slim.columns.count(!_.startsWith("__")) == 3)
    assert(slim.where($"id" === 19).count() == 2)
  }

  test("masking a non-string field yields null, not an ANSI cast error (U2)") {
    val out = EnvelopeDecode.changes(raw, Debezium.productsRow,
      DecodeOptions(maskFields = Seq("stock_quantity")))
    assert(out.select("stock_quantity").collect().forall(_.isNullAt(0)))
    assert(out.schema("stock_quantity").dataType ==
      Debezium.productsRow("stock_quantity").dataType)
  }

  test("field-name sanitization (U3)") {
    assert(EnvelopeDecode.sanitize("weird field-name!") == "weird_field_name_")
    assert(EnvelopeDecode.sanitize("9lives") == "_9lives")
  }

  test("payload-only wire format decodes (U4, schemas.enable=false)") {
    val bare = raw.select(
      regexp_replace(regexp_extract($"value", "^\\{\"payload\":(.*)\\}$", 1), "^null$", "")
        .as("value"))
      .where($"value" =!= "")
    val out = EnvelopeDecode.changes(bare, Debezium.productsRow,
      DecodeOptions(wrapped = false))
    assert(out.count() == 2)
  }

  test("errors.tolerance=none: FAILFAST raises on broken input (U6)") {
    val strict = EnvelopeDecode.changes(raw, Debezium.productsRow,
      DecodeOptions(tolerateBroken = false))
    val e = intercept[org.apache.spark.SparkException] { strict.count() }
    assert(e.getMessage.contains("MALFORMED_RECORD") ||
      e.getCause != null)
  }

  test("typed cast layer: ISO-Z timestamps and micro-timestamps") {
    val df = Seq(("2024-01-01T10:00:00Z", 1704103200000000L)).toDF("iso", "micros")
    val got = df.select(
      EnvelopeDecode.castIsoTimestamp($"iso").cast("long").as("a"),
      EnvelopeDecode.castMicroTimestamp($"micros").cast("long").as("b"))
      .as[(Long, Long)].head()
    assert(got._1 == 1704103200L)
    assert(got._2 == 1704103200L)
  }

  test("changes(fields=) matches the full path and prunes the wire parse") {
    val opts = DecodeOptions(deletePolicy = DeletePolicy.Rewrite,
      maskFields = Seq("name"))
    val full = EnvelopeDecode.changes(raw, Debezium.productsRow, opts)
      .select("id", "name", "price", "__op", "__deleted")
    val pruned = EnvelopeDecode.changes(raw, Debezium.productsRow, opts,
      fields = Some(Seq("id", "name", "price")))
      .select("id", "name", "price", "__op", "__deleted")
    assert(pruned.collect().toSet == full.collect().toSet)
    // the pruned parse schema must not mention unselected row fields
    val plan = pruned.queryExecution.optimizedPlan.toString
    assert(!plan.contains("stock_quantity"))
    // masked fields are constants — never parsed off the wire
    assert(!plan.contains("before.name") && !plan.contains("after.name"))
  }

  test("changes(fields=) with only masked/meta columns parses no row struct") {
    val opts = DecodeOptions(deletePolicy = DeletePolicy.Rewrite,
      maskFields = Seq("price"))
    val out = EnvelopeDecode.changes(raw, Debezium.productsRow, opts,
      fields = Some(Seq("price")))
    assert(out.columns.toSeq == Seq("price", "__op", "__ts_ms", "__source_db",
      "__source_table", "__lsn", "__deleted"))
    assert(out.count() == 3)
    assert(out.where($"__deleted").count() == 1)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("after") && !plan.contains("before"))
  }

  test("transaction metadata surfaces when requested (U5)") {
    val withTxn = Seq(
      envJson("c", "null", rowA, 5000L).replace("\"transaction\":null",
        """"transaction":{"id":"571","total_order":1,"data_collection_order":1}""")
    ).toDF("value")
    val out = EnvelopeDecode.changes(withTxn, Debezium.productsRow,
      DecodeOptions(keepTransaction = true))
    assert(out.select("__transaction.id").as[String].head() == "571")
  }
}
