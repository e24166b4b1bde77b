package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._

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
  * Third gate (r10): the same single-task failure mode hides behind a
  * LOW-CARDINALITY `partitionBy`. `partitionBy(status)` over base-grain
  * orders is partitioned in letter only — 3 partition values means each
  * task sorts ~n/3 rows. A Window whose input is unbounded and whose
  * partition keys ALL resolve to bounded-domain expressions (bare
  * non-key attributes, literal-labeled CASE buckets) is flagged.
  * Partition keys that resolve to a per-entity key/id, to a calendar
  * bucket (year/month/day functions — cardinality grows with the time
  * span, not the data volume), or to a physical-partition id
  * (`_rk_pid`, `spark_partition_id()` — balanced by construction)
  * distribute, and pass.
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

  /** Partition keys that ALL resolve to provably-bounded-domain values
    * over an unbounded input: single-task in all but name. String- or
    * boolean-typed bare attributes are enum-ish (status, source, lang,
    * segment); the fixed-domain dimension keys (nation/region: 25/5
    * values by construction) are the numeric members of the class.
    * Numeric bare attributes otherwise pass as value-space partitions
    * (distinct values scale with the data) — a documented limitation:
    * a numeric low-card label column evades this tripwire. */
  private def lowCardPartition(w: Window, defs: Map[ExprId, Expression])
      : Boolean =
    w.partitionSpec.nonEmpty && w.partitionSpec.forall { pe =>
      val r = resolve(pe, defs)
      val fixedDomainKey = core(r) match {
        case a: AttributeReference =>
          FixedDomainKeys.contains(a.name.toLowerCase)
        case _ => false
      }
      fixedDomainKey ||
        (!keyGrain(r) && !partitionId(r) && !timeBucketed(r) &&
          (core(r) match {
            case a: AttributeReference =>
              a.dataType == org.apache.spark.sql.types.StringType ||
                a.dataType == org.apache.spark.sql.types.BooleanType
            case c: CaseWhen =>                // literal-labeled buckets
              (c.branches.map(_._2) ++ c.elseValue).forall(_.foldable)
            case e => e.foldable
          }))
    }

  /** One plan sweep over every query: (unbounded offenders,
    * query names with certified bounded unpartitioned windows). */
  private lazy val (offenders, certified): (Seq[String], Set[String]) = {
    val off = scala.collection.mutable.ArrayBuffer.empty[String]
    val cert = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.optimizedPlan
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      (plan +: plan.subqueriesAll).foreach { root =>
        val defs = definitions(root)
        root.foreach {
          case w: Window if w.partitionSpec.forall(_.foldable) =>
            if (bounded(w.child)) cert += name
            else off += s"$name: Window(${w.orderSpec.map(_.sql).mkString(", ")})"
          case w: Window if lowCardPartition(w, defs) =>
            if (!bounded(w.child))
              off += s"$name: low-card partitionBy(" +
                s"${w.partitionSpec.map(_.sql).mkString(", ")}) over " +
                "base-grain input"
          case _ => ()
        }
      }
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
}
