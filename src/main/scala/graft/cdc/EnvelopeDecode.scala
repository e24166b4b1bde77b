package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.Debezium

/** What to do with delete events (`op = "d"`, `after` null).
  *
  * The reference has two live behaviors plus one implied:
  *  - Drop: `WHERE JSONHas(value,'payload','after')` silently drops
  *    deletes+tombstones (`basic_example/init.sql:63`,
  *    `init_transpassport.sql:91`).
  *  - Rewrite: `ExtractNewRecordState` with
  *    `delete.handling.mode=rewrite` keeps deletes as a row flagged
  *    `__deleted=true` (`abcsvb-connector-secure.json:31-35`).
  *  - Apply: consume the delete downstream by removing the key from
  *    current state (the ReplacingMergeTree table never does this —
  *    we offer it as the strictly-stronger option).
  */
sealed trait DeletePolicy
object DeletePolicy {
  case object Drop extends DeletePolicy
  case object Rewrite extends DeletePolicy
  case object Apply extends DeletePolicy
}

/** Decode options mirroring the Debezium connector/SMT config surface
  * (`abcsvb-connector-secure.json:27-53`). */
final case class DecodeOptions(
    /** `schemas.enable`: wire value is `{schema, payload}` (true) or the
      * bare payload (false) — U4. */
    wrapped: Boolean = true,
    deletePolicy: DeletePolicy = DeletePolicy.Drop,
    /** `MaskField$Value` SMT — U2. Columns blanked after unwrap. */
    maskFields: Seq[String] = Nil,
    /** `sanitize.field.names=true` — U3. */
    sanitizeNames: Boolean = false,
    /** `add.fields=op,ts_ms,source.db,source.table` — U1 metadata. */
    addMeta: Boolean = true,
    /** Keep the `transaction` block as a struct column — U5. */
    keepTransaction: Boolean = false,
    /** `errors.tolerance`: true = PERMISSIVE parse + drop corrupt rows
      * (the `kafka_skip_broken_messages=1` analog — F3); false =
      * FAILFAST (`errors.tolerance=none` — U6). */
    tolerateBroken: Boolean = true)

/** Debezium-envelope JSON → typed change rows, Spark-first.
  *
  * The reference does this with per-field `JSONExtract*` calls in a
  * ClickHouse MV (`basic_example/clickhouse.sql:57-68`). Here the whole
  * envelope is parsed once with `from_json` (Jackson, codegen'd,
  * schema-pruned by Catalyst's OptimizeJsonExprs) and fields are struct
  * accesses — one parse per event instead of N. At 100 TB the JSON
  * parse is the ingest bottleneck, so single-pass parsing is the main
  * scale win over the reference's 8-15 extracts per row.
  */
object EnvelopeDecode {

  /** Parse a raw-JSON column (`value`) into an envelope struct column
    * named `_env`. Broken messages become a null `_env` (PERMISSIVE) and
    * are dropped when `tolerateBroken` (F3), else FAILFAST (U6).
    *
    * `fields` restricts the parse to the named top-level envelope
    * fields (`before`/`after`/`source`/`ts_ms`/`transaction`; `op` is
    * always parsed for the broken-record filter). Catalyst's own JSON
    * pruning is single-level and the whole envelope sits under
    * `payload`, so this explicit projection is what actually keeps
    * Jackson from materializing a 20-field struct when a pipeline reads
    * two fields — at ingest scale the JSON parse IS the bottleneck. */
  def decode(raw: DataFrame, rowSchema: StructType,
             opts: DecodeOptions = DecodeOptions(),
             valueCol: String = "value",
             fields: Option[Seq[String]] = None): DataFrame = {
    val prunedPayload = fields match {
      case Some(fs) =>
        val keep = (fs :+ "op").toSet
        StructType(Debezium.payloadSchema(rowSchema).fields.filter(f =>
          keep.contains(f.name)))
      case None => Debezium.payloadSchema(rowSchema)
    }
    // PERMISSIVE is from_json's default — and passing ANY explicit
    // option disables Catalyst's OptimizeJsonExprs schema pruning, so
    // the permissive path must use empty options (verified by
    // PlanSpec's pruning assertion).
    val parseOpts =
      if (opts.tolerateBroken) Map.empty[String, String]
      else Map("mode" -> "FAILFAST")
    val wireSchema =
      if (opts.wrapped)
        StructType(Seq(org.apache.spark.sql.types.StructField("payload", prunedPayload)))
      else prunedPayload
    val parsed =
      if (opts.wrapped)
        raw.withColumn("_env",
          from_json(col(valueCol), wireSchema, parseOpts).getField("payload"))
      else
        raw.withColumn("_env", from_json(col(valueCol), wireSchema, parseOpts))
    if (opts.tolerateBroken)
      // PERMISSIVE yields an all-null struct for corrupt input; a real
      // envelope always carries `op`. Referencing ONLY `_env.op` (not
      // the whole struct) keeps Catalyst's JSON schema pruning
      // (OptimizeJsonExprs) applicable: a downstream query that reads
      // two fields parses two fields, not the 20-field envelope.
      parsed.where(col("_env.op").isNotNull)
    else parsed
  }

  /** Unwrap `payload.after` into top-level columns (U1 /
    * `ExtractNewRecordState`), applying the delete policy, metadata
    * add-fields, masking and name sanitization. Input: a frame with the
    * `_env` struct from [[decode]].
    *
    * `fields` restricts the output to that subset of row columns (in
    * `rowSchema` order) — pair with a [[decode]] whose before/after
    * structs were pruned to the same subset (see [[changes]]). */
  def unwrap(decoded: DataFrame, rowSchema: StructType,
             opts: DecodeOptions = DecodeOptions(),
             fields: Option[Seq[String]] = None): DataFrame = {
    val filtered = opts.deletePolicy match {
      case DeletePolicy.Drop =>
        // F1: `WHERE JSONHas(value,'payload','after')` — also drops
        // tombstones (null payload).
        decoded.where(col("_env.after").isNotNull)
      case _ => decoded
    }

    // Delete rewrite: a delete has `after = null`; resurrect the row
    // image from `before` and flag it (Debezium's rewrite mode).
    val rowSide = opts.deletePolicy match {
      case DeletePolicy.Drop => col("_env.after")
      case _ => when(col("_env.op") === "d", col("_env.before"))
                  .otherwise(col("_env.after"))
    }

    val keptFields = fields match {
      case Some(fs) => rowSchema.fields.toSeq.filter(f => fs.contains(f.name))
      case None => rowSchema.fields.toSeq
    }
    val base: Seq[Column] = keptFields.map { f =>
      val c = rowSide.getField(f.name)
      val masked =
        if (opts.maskFields.contains(f.name)) f.dataType match {
          // U2 — Debezium's MaskField blanks string fields; for any
          // other type the mask is null ("" cast to a numeric type is
          // an ANSI runtime error, not a mask)
          case org.apache.spark.sql.types.StringType => lit("")
          case dt => lit(null).cast(dt)
        }
        else c
      masked.as(if (opts.sanitizeNames) sanitize(f.name) else f.name)
    }

    val meta: Seq[Column] =
      if (opts.addMeta) Seq(
        col("_env.op").as("__op"),
        col("_env.source.ts_ms").as("__ts_ms"),
        col("_env.source.db").as("__source_db"),
        col("_env.source.table").as("__source_table"),
        col("_env.source.lsn").as("__lsn"))
      else Seq.empty

    val deleted: Seq[Column] = opts.deletePolicy match {
      case DeletePolicy.Drop => Seq.empty
      case _ => Seq((col("_env.op") === "d").as("__deleted"))
    }

    val txn: Seq[Column] =
      if (opts.keepTransaction) Seq(col("_env.transaction").as("__transaction"))
      else Seq.empty

    filtered.select(base ++ meta ++ deleted ++ txn: _*)
  }

  /** decode ∘ unwrap.
    *
    * With `fields = Some(fs)` the wire parse is pruned end-to-end: the
    * before/after structs inside the `from_json` schema keep only the
    * requested row columns, the `before` branch is parsed only when the
    * delete policy needs it, `source`/`transaction` only when the
    * options project them — and **masked fields are never parsed at
    * all** (their output is a constant). q61's decode-only `fields=`
    * path measured ~3× on this data; this extends the same pruning to
    * the full unwrap path (q62: one string field parsed instead of the
    * 9-column row twice plus the 12-field source block). */
  def changes(raw: DataFrame, rowSchema: StructType,
              opts: DecodeOptions = DecodeOptions(),
              valueCol: String = "value",
              fields: Option[Seq[String]] = None): DataFrame = fields match {
    case None =>
      unwrap(decode(raw, rowSchema, opts, valueCol), rowSchema, opts)
    case Some(fs) =>
      // Masked columns become `lit("")` in unwrap — exclude them from the
      // parse schema entirely.
      val parseFs = fs.filterNot(opts.maskFields.contains)
      val prunedRow = StructType(rowSchema.fields.filter(f => parseFs.contains(f.name)))
      val needRowSide = prunedRow.nonEmpty
      val envFields =
        (if (needRowSide || opts.deletePolicy == DeletePolicy.Drop) Seq("after") else Nil) ++
        (if (needRowSide && opts.deletePolicy != DeletePolicy.Drop) Seq("before") else Nil) ++
        (if (opts.addMeta) Seq("source") else Nil) ++
        (if (opts.keepTransaction) Seq("transaction") else Nil)
      val decoded = decode(raw, prunedRow, opts, valueCol, Some(envFields.distinct))
      unwrap(decoded, rowSchema, opts, Some(fs))
  }

  /** U3: `sanitize.field.names` — squash anything outside
    * `[A-Za-z0-9_]` to `_` (leading digit prefixed). */
  def sanitize(name: String): String = {
    val s = name.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    if (s.nonEmpty && s.head.isDigit) "_" + s else s
  }

  /** The reference's typed "usable view" cast layer
    * (`clickhouse.sql:70-82`): `toInt32` ≡ cast int, `toFloat64` ≡ cast
    * (we offer exact decimal), `toDateTime64(trimRight(x,'Z'),6,'UTC')`
    * ≡ `to_timestamp(rtrim(x,'Z'))` under a UTC session. */
  def castIsoTimestamp(c: Column): Column = to_timestamp(rtrim(c, "Z"))

  /** MicroTimestamp duality (SURVEY §7 risk 4): the same logical column
    * arrives as ISO-string-with-Z or as int64 µs epoch
    * (`io.debezium.time.MicroTimestamp`). */
  def castMicroTimestamp(c: Column): Column = timestamp_micros(c.cast("long"))
}
