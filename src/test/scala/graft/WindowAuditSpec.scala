package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Fleet-wide ban on the single-partition window anti-pattern.
  *
  * An unpartitioned (or constant-partitioned) Window sorts its whole
  * input in ONE task. That is acceptable only when the input is
  * aggregate-grain (a census, a lattice, a per-month table — bounded by
  * a grouping, not by the data volume); over base-table-grain rows it is
  * the executor-side equivalent of collecting the table to the driver,
  * and the first thing to fall over at 100 TB. Row-grain order
  * statistics must go through [[graft.operators.Ranks]] instead.
  *
  * The detector walks every `SparkEntry` query's optimized logical plan
  * (subqueries included): a Window with an empty/foldable partition spec
  * is an offender if ANY leaf relation is reachable from it without
  * passing through an Aggregate / limit / single-row barrier — i.e. its
  * input cardinality scales with the data rather than with a group-by
  * key space. Constant partition keys count as unpartitioned on purpose:
  * `partitionBy(lit(0))` silences Spark's WARN without changing the
  * execution, and must not silence this audit.
  *
  * Second gate (r9): the CERTIFIED sites — unpartitioned windows whose
  * input IS aggregate-grain — are not merely tolerated, they are
  * ENUMERATED. [[allowlist]] freezes the set of queries allowed to run
  * one; adding a new unpartitioned window anywhere, even a bounded one,
  * fails this spec until the author consciously lists it here. (These
  * sites are also the source of the cosmetic `WindowExec: No Partition
  * Defined` WARNs in bench logs — the closed list is the proof each
  * one is a certified lattice-grain sort, not an accident.)
  */
class WindowAuditSpec extends SparkSpec {

  /** True if every path from `p` down to a leaf crosses a
    * cardinality-bounding node (aggregate / limit / literal relation). */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
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
        root.foreach {
          case w: Window if w.partitionSpec.forall(_.foldable) =>
            if (bounded(w.child)) cert += name
            else off += s"$name: Window(${w.orderSpec.map(_.sql).mkString(", ")})"
          case _ => ()
        }
      }
    }
    (off.toSeq, cert.toSet)
  }

  test("no query plan sorts base-grain rows in an unpartitioned window") {
    assert(offenders.isEmpty,
      s"${offenders.size} unpartitioned data-grain window(s):\n" +
        offenders.distinct.mkString("\n"))
  }

  /** Queries CERTIFIED to run an unpartitioned window over an
    * aggregate-grain input. Every entry was read and its bound
    * identified (a groupBy key space, a top-k limit, or a
    * Lattice.checkpointBounded frame upstream of the window). Keep
    * sorted; grow only with a review of the new site's bound. */
  private val allowlist: Set[String] = Set(
    // populated from the r9 sweep — see test below for the diff on drift
  ) ++ AllowedUnpartitionedWindows.names

  test("certified unpartitioned-window sites form a closed allowlist") {
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
