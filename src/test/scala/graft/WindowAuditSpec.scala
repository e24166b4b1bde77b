package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.graftx.{ColumnBridge, PlanBridge}

/** Fleet-wide ban on the single-partition window anti-pattern.
  *
  * An unpartitioned (or constant-partitioned) Window sorts its whole
  * input in ONE task. That is acceptable only when the input is
  * aggregate-grain (a census, a lattice, a per-month table — bounded by
  * a grouping over a data-independent domain, not by the data volume);
  * over base-table-grain rows it is the executor-side equivalent of
  * collecting the table to the driver, and the first thing to fall over
  * at 100 TB. Row-grain order statistics must go through
  * [[graft.operators.Ranks]] instead.
  *
  * The detector walks every `SparkEntry` query's optimized logical plan
  * (subqueries included): a Window with an empty/foldable partition spec
  * is an offender if ANY leaf relation is reachable from it without
  * passing through a cardinality barrier. Constant partition keys count
  * as unpartitioned on purpose: `partitionBy(lit(0))` silences Spark's
  * WARN without changing the execution, and must not silence this audit.
  *
  * GRAIN criterion (r10, tightened): an `Aggregate` is a barrier only
  * if none of its grouping keys is KEY-GRAIN — a bare (alias/cast-
  * wrapped) attribute whose name marks a per-entity key (`*key`,
  * `*_id`, `id`). Key grains scale linearly with the data volume
  * (parts, customers, orders, docs, vectors), so "it went through a
  * groupBy" proves nothing: an unpartitioned window over per-partkey
  * revenue is still a single task sorting billions of rows at 100 TB.
  * Value-space censuses (distinct lengths, buckets), time buckets and
  * literal grids remain barriers. Dimension-table keys with fixed
  * domains (`nationkey`, `regionkey`: 25/5 rows by construction) are
  * exempt. Checkpoints hide their lineage, so a `LogicalRDD` is a
  * barrier only when it was materialized through
  * `Lattice.checkpointBounded` (runtime-asserted cardinality).
  *
  * Third gate (r10, CLOSED TYPE-AGNOSTIC in r11): the same single-task
  * failure mode hides behind a LOW-CARDINALITY `partitionBy`.
  * `partitionBy(status)` over base-grain orders is partitioned in
  * letter only — 3 partition values means each task sorts ~n/3 rows.
  * Every partition key is classified:
  *  - DISTRIBUTES — per-entity key/id, physical-partition id
  *    (`_rk_pid`, `spark_partition_id()`), calendar bucket, or a bare
  *    date/timestamp attribute (cardinality grows with the time span);
  *  - BOUNDED-DOMAIN — string/boolean bare attrs (enum-ish labels),
  *    fixed-domain dimension keys, literal-output CASE buckets,
  *    mod-by-literal buckets (`pmod`/`%` with a foldable divisor), or
  *    any foldable expression — regardless of OUTPUT TYPE (the r10
  *    gate only looked at string/boolean, so a numeric label evaded
  *    it);
  *  - UNKNOWN — a bare numeric attribute or opaque computed key.
  * A window over an unbounded input whose keys are ALL bounded-domain
  * is flagged statically. A window with no distributing key and at
  * least one UNKNOWN key is settled by a RUNTIME TWO-SCALE PROBE: the
  * key tuple's distinct count is measured at sf0.001 and sf0.01 — a
  * data-scaled value space grows with the data; a numeric label or a
  * fixed value domain (`l_linenumber`: 1..7 at every scale) does not.
  * Rows grew ≥2× with the key domain essentially flat → flagged.
  *
  * Second gate (r9): the CERTIFIED sites — unpartitioned windows whose
  * input IS aggregate-grain — are not merely tolerated, they are
  * ENUMERATED. [[AllowedUnpartitionedWindows]] freezes the set of
  * queries allowed to run one; adding a new unpartitioned window
  * anywhere, even a bounded one, fails this spec until the author
  * consciously lists it. (These sites are also the source of the
  * cosmetic `WindowExec: No Partition Defined` WARNs in bench logs —
  * the closed list is the proof each one is a certified lattice-grain
  * sort, not an accident.)
  */
class WindowAuditSpec extends SparkSpec {

  /** Second scale factor for the runtime cardinality probe: env
    * override first, else the sf0.01 sibling of the suite's sfDir
    * (both come from the same testdata layout). When the directory is
    * absent the probe-dependent tests cancel with a clear message
    * instead of failing on a hardcoded path. */
  private val probeDirBig = sys.env.getOrElse("SPARK_GRAFT_PROBE_SF_DIR",
    new java.io.File(sfDir).getParentFile match {
      case null => "sf0.01"
      case parent => new java.io.File(parent, "sf0.01").getPath
    })
  private lazy val probeAvailable =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(probeDirBig))

  private def requireProbeDir(): Unit =
    assume(probeAvailable,
      s"two-scale probe dir $probeDirBig absent — set " +
        "SPARK_GRAFT_PROBE_SF_DIR to a larger-scale copy of the testdata")

  /** Per-entity key names: cardinality scales with the data. The
    * nation/region dimension keys are fixed-domain (25/5) and exempt. */
  private val KeyName = "(?i)^(\\w*key|\\w*_id|id)$".r.pattern
  private val FixedDomainKeys =
    Set("n_nationkey", "r_regionkey", "s_nationkey", "c_nationkey")

  /** Alias definitions visible in `p`, for resolving an attribute back
    * to the expression that produced it (optimized plans collapse most
    * projects, but window partition keys still arrive as attributes). */
  private def definitions(p: LogicalPlan): Map[ExprId, Expression] =
    p.collect {
      case pr: Project =>
        pr.projectList.collect { case a: Alias => a.exprId -> a.child }
      case ag: Aggregate =>
        ag.aggregateExpressions.collect { case a: Alias => a.exprId -> a.child }
      case w: Window =>
        w.windowExpressions.collect { case a: Alias => a.exprId -> a.child }
    }.flatten.toMap

  private def resolve(e: Expression, defs: Map[ExprId, Expression],
                      depth: Int = 8): Expression =
    if (depth <= 0) e
    else e.transformUp {
      case a: AttributeReference if defs.contains(a.exprId) =>
        resolve(defs(a.exprId), defs, depth - 1)
    }

  /** Strip wrappers that don't change grain. */
  @annotation.tailrec
  private def core(e: Expression): Expression = e match {
    case Alias(c, _) => core(c)
    case c: Cast => core(c.child)
    case _ => e
  }

  /** Bare attribute whose name marks a data-scaled per-entity key. */
  private def keyGrain(e: Expression): Boolean = core(e) match {
    case a: AttributeReference =>
      KeyName.matcher(a.name).matches() &&
        !FixedDomainKeys.contains(a.name.toLowerCase)
    case _ => false
  }

  /** Physical-partition ids distribute by construction. */
  private def partitionId(e: Expression): Boolean = core(e) match {
    case a: AttributeReference => a.name == "_rk_pid"
    case _: SparkPartitionID => true
    case _: MonotonicallyIncreasingID => true
    case other => other.children.exists {
      case _: SparkPartitionID | _: MonotonicallyIncreasingID => true
      case _ => false
    }
  }

  /** Calendar-bucket heads: cardinality grows with the covered time
    * span, never with the row count. */
  private def timeBucketed(e: Expression): Boolean =
    e.exists {
      case _: DateFormatClass | _: TruncDate | _: TruncTimestamp |
           _: Year | _: Quarter | _: Month | _: WeekOfYear |
           _: DayOfYear | _: DayOfMonth | _: DayOfWeek | _: WeekDay |
           _: Hour | _: Minute | _: MonthsBetween | _: DateDiff |
           _: UnixDate | _: UnixTimestamp | _: ToUnixTimestamp => true
      case _ => false
    }

  /** True if every path from `p` down to a leaf crosses a
    * cardinality-bounding node (key-grain-free aggregate / limit /
    * literal relation / blessed checkpoint). */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case a: Aggregate =>
      val defs = definitions(a)
      // s.range(...) leaves have literal bounds (driver-authored
      // grids) but name their column `id` — exempt their attributes
      // from the key-grain pattern.
      val rangeIds = a.collect { case r: Range => r.output.map(_.exprId) }
        .flatten.toSet
      a.groupingExpressions.forall { g =>
        val r = resolve(g, defs)
        !keyGrain(r) || (core(r) match {
          case at: AttributeReference => rangeIds.contains(at.exprId)
          case _ => false
        })
      }
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case _: Distinct => true
    case _: LocalRelation => true   // literal rows — driver-authored grid
    case _: OneRowRelation => true
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      // a checkpoint hides its bounding Aggregate; only frames that went
      // through Lattice.checkpointBounded (runtime-asserted cardinality)
      // count as aggregate-grain
      graft.operators.Lattice.isBounded(l.rdd.id)
    case l: LeafNode => false       // file scan / RDD scan: data-sized
    case other => other.children.forall(bounded)
  }

  /** Partition-key classification — see class scaladoc third gate. */
  private object KeyClass extends Enumeration {
    val Distributes, BoundedDomain, Unknown = Value
  }

  private def classifyKey(pe: Expression,
                          defs: Map[ExprId, Expression]): KeyClass.Value = {
    import org.apache.spark.sql.types._
    val r = resolve(pe, defs)
    val c = core(r)
    val fixedDomainKey = c match {
      case a: AttributeReference =>
        FixedDomainKeys.contains(a.name.toLowerCase)
      case _ => false
    }
    if (fixedDomainKey) KeyClass.BoundedDomain
    else if (keyGrain(r) || partitionId(r) || timeBucketed(r))
      KeyClass.Distributes
    else c match {
      case a: AttributeReference if a.dataType == StringType ||
          a.dataType == BooleanType => KeyClass.BoundedDomain
      case a: AttributeReference if a.dataType == DateType ||
          a.dataType.isInstanceOf[TimestampType] ||
          a.dataType == TimestampNTZType =>
        KeyClass.Distributes                   // time-span-scaled
      case _: AttributeReference => KeyClass.Unknown // bare numeric attr
      case cw: CaseWhen                        // literal-labeled buckets,
          if (cw.branches.map(_._2) ++ cw.elseValue) // ANY output type
            .forall(_.foldable) => KeyClass.BoundedDomain
      case Pmod(_, d, _) if d.foldable => KeyClass.BoundedDomain
      case Remainder(_, d, _) if d.foldable => KeyClass.BoundedDomain
      case e if e.foldable => KeyClass.BoundedDomain
      case _ => KeyClass.Unknown               // opaque computed key
    }
  }

  /** Execute `SELECT count(distinct keys), count(*)` on a window's
    * child subplan. */
  private def probeCounts(w: Window): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val df = PlanBridge.ofRows(spark, w.child)
    val keys = w.partitionSpec.map(ColumnBridge.column)
    val row = df.agg(countDistinct(struct(keys: _*)).as("d"),
      count(lit(1)).as("n")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** Audit ONE query: returns (offender descriptions, certified —
    * plans a bounded unpartitioned window). Probing requires planning
    * the query a second time at [[probeDirBig]]; done lazily, only for
    * queries that have probe-candidate windows. */
  private def auditQuery(name: String,
      fn: (SparkSession, String) => DataFrame): (Seq[String], Boolean) = {
    val off = scala.collection.mutable.ArrayBuffer.empty[String]
    var cert = false
    val plan =
      try fn(spark, sfDir).queryExecution.optimizedPlan
      catch { case e: Throwable =>
        fail(s"$name failed to plan: ${e.getMessage}")
      }
    def windowsOf(p: LogicalPlan): Seq[Window] =
      (p +: p.subqueriesAll).flatMap(root =>
        root.collect { case w: Window => w })
    // windows needing the two-scale probe, by index in traversal order
    val probeIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    val smallWindows = windowsOf(plan)
    smallWindows.zipWithIndex.foreach { case (w, i) =>
      val defs = definitions(plan)
      if (w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable)) {
        if (bounded(w.child)) cert = true
        else off += s"$name: Window(${w.orderSpec.map(_.sql).mkString(", ")})"
      } else if (!bounded(w.child)) {
        val classes = w.partitionSpec.map(classifyKey(_, defs))
        if (classes.forall(_ == KeyClass.BoundedDomain))
          off += s"$name: low-card partitionBy(" +
            s"${w.partitionSpec.map(_.sql).mkString(", ")}) over " +
            "base-grain input"
        else if (!classes.contains(KeyClass.Distributes) &&
            classes.contains(KeyClass.Unknown))
          probeIdx += i
      }
    }
    if (probeIdx.nonEmpty) {
      requireProbeDir()
      val bigPlan = fn(spark, probeDirBig).queryExecution.optimizedPlan
      val bigWindows = windowsOf(bigPlan)
      // Pair windows across the two plans by STRUCTURAL key — the
      // partition/order spec SQL — not traversal index: plan choices
      // can depend on size estimates, and index pairing would silently
      // compare mismatched windows when the two plans order or shape
      // their Window nodes differently. Equal signature multisets are
      // required; within a signature, occurrence order pairs (two
      // same-signature windows are interchangeable for a cardinality
      // probe of their partition keys).
      def sig(w: Window): String =
        w.partitionSpec.map(_.sql).mkString(",") + " ORDER " +
          w.orderSpec.map(_.sql).mkString(",")
      val bigBySig = bigWindows.groupBy(sig)
      val smallBySig = smallWindows.groupBy(sig)
      assert(smallBySig.keySet == bigBySig.keySet &&
        smallBySig.forall { case (k, v) => bigBySig(k).size == v.size },
        s"$name: window signature multisets differ across scale factors " +
          s"— probe cannot pair\n  small: " +
          smallBySig.view.mapValues(_.size).toMap + s"\n  big: " +
          bigBySig.view.mapValues(_.size).toMap)
      probeIdx.foreach { i =>
        val w = smallWindows(i)
        val ordinal = smallWindows.take(i).count(sig(_) == sig(w))
        val (dSmall, nSmall) = probeCounts(w)
        val (dBig, nBig) = probeCounts(bigBySig(sig(w))(ordinal))
        // rows grew ≥2× but the key domain stayed essentially flat →
        // a label / fixed value domain partitioned in letter only.
        // (+4 absorbs noise on tiny domains; 1.5× tolerates slowly-
        // growing-but-genuine value spaces.)
        if (nSmall > 0 && nBig >= 2 * nSmall &&
            dBig < 1.5 * dSmall + 4)
          off += s"$name: numeric/opaque low-card partitionBy(" +
            s"${smallWindows(i).partitionSpec.map(_.sql).mkString(", ")}" +
            s") over base-grain input — probed distinct $dSmall→$dBig " +
            s"while rows $nSmall→$nBig"
      }
    }
    (off.toSeq, cert)
  }

  /** One sweep over every query: (unbounded offenders,
    * query names with certified bounded unpartitioned windows). */
  private lazy val (offenders, certified): (Seq[String], Set[String]) = {
    val off = scala.collection.mutable.ArrayBuffer.empty[String]
    val cert = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val (o, c) = auditQuery(name, fn)
      off ++= o
      if (c) cert += name
    }
    (off.toSeq, cert.toSet)
  }

  test("no query plan sorts base-grain rows in an unpartitioned or " +
      "low-cardinality-partitioned window") {
    assert(offenders.isEmpty,
      s"${offenders.size} data-grain window offender(s):\n" +
        offenders.distinct.mkString("\n"))
  }

  test("certified unpartitioned-window sites form a closed allowlist") {
    val allowlist = AllowedUnpartitionedWindows.names
    val extra = certified -- allowlist
    val stale = allowlist -- certified
    assert(extra.isEmpty && stale.isEmpty,
      (if (extra.nonEmpty)
        s"NEW unpartitioned-window site(s) not in the allowlist " +
          s"(review the bound, then add to AllowedUnpartitionedWindows):\n  " +
          extra.toSeq.sorted.mkString("\n  ") + "\n"
      else "") +
      (if (stale.nonEmpty)
        s"STALE allowlist entries (site no longer plans an " +
          s"unpartitioned window — remove):\n  " +
          stale.toSeq.sorted.mkString("\n  ")
      else ""))
  }

  // ---- red team: the blind spots this audit version closes ----------

  test("red team: a bare NUMERIC label partitionBy over base grain " +
      "is flagged by the two-scale probe") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    // l_linenumber is 1..7 at EVERY scale factor — a numeric label in
    // all but name; the r10 string/boolean gate let exactly this shape
    // through for 9 rounds (q194's class).
    val fn = (s: SparkSession, dir: String) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("rn", row_number().over(
          W.partitionBy(col("l_linenumber"))
            .orderBy(col("l_extendedprice"), col("l_orderkey"),
              col("l_linenumber"))))
    val (off, _) = auditQuery("redteam_numeric_label", fn)
    assert(off.nonEmpty && off.head.contains("probed distinct"),
      s"numeric label partition evaded the audit: $off")
  }

  test("red team: a numeric CASE bucket partitionBy over base grain " +
      "is flagged statically (type-agnostic literal buckets)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val fn = (s: SparkSession, dir: String) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("bucket", when(col("l_quantity") < 10, 1)
          .when(col("l_quantity") < 30, 2).otherwise(3))
        .withColumn("rn", row_number().over(
          W.partitionBy(col("bucket"))
            .orderBy(col("l_extendedprice"), col("l_orderkey"),
              col("l_linenumber"))))
    val (off, _) = auditQuery("redteam_numeric_case", fn)
    assert(off.nonEmpty && off.exists(_.contains("low-card partitionBy")),
      s"numeric CASE bucket partition evaded the audit: $off")
  }

  test("red team: a mod-by-literal bucket partitionBy over base grain " +
      "is flagged statically") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val fn = (s: SparkSession, dir: String) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("rn", row_number().over(
          W.partitionBy(pmod(col("l_partkey"), lit(8)))
            .orderBy(col("l_extendedprice"), col("l_orderkey"),
              col("l_linenumber"))))
    val (off, _) = auditQuery("redteam_mod_bucket", fn)
    assert(off.nonEmpty && off.exists(_.contains("low-card partitionBy")),
      s"mod-by-literal bucket partition evaded the audit: $off")
  }

  test("negative control: a data-scaled numeric value-space partition " +
      "passes the probe") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    // distinct l_extendedprice values grow with the data — a genuine
    // value-space partition must NOT be flagged.
    val fn = (s: SparkSession, dir: String) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("rn", row_number().over(
          W.partitionBy(col("l_extendedprice"))
            .orderBy(col("l_orderkey"), col("l_linenumber"))))
    val (off, _) = auditQuery("control_value_space", fn)
    assert(off.isEmpty, s"value-space partition falsely flagged: $off")
  }
}
