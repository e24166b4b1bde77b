package graft

/** Fleet-wide ban on unplanned CartesianProduct — the physical-plan
  * sibling of [[WindowAuditSpec]].
  *
  * A CartesianProductExec materializes |left-partitions| ×
  * |right-partitions| tasks and |L|·|R| row pairs. Two ways it sneaks
  * into a plan that "looks" fine:
  *  1. an intentionally-tiny side whose SIZE ESTIMATE is huge — a
  *     checkpointed LogicalRDD inherits its ORIGIN plan's estimate,
  *     not its actual cardinality, so a 10-row lattice can read as
  *     17 MB and push a non-equi join from BroadcastNestedLoop to
  *     Cartesian (observed: q299 at +8 s / 12k empty tasks after a
  *     Ranks internals change shifted upstream estimates);
  *  2. a genuinely unbounded cross join, which must never ship.
  *
  * The detector walks every query's pre-AQE physical plan
  * (`sparkPlan` — deterministic, AQE-independent) and fails on ANY
  * CartesianProductExec. BroadcastNestedLoopJoin is fine (one side is
  * proven broadcast-small); documented bounded cross joins are
  * expected to plan as BNLJ precisely because their bounded side is
  * broadcast-hinted or estimate-small — if one degrades to Cartesian,
  * that's the regression this spec exists to catch. */
class CartesianAuditSpec extends SparkSpec {

  private lazy val offenders: Seq[String] = {
    val off = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.sparkPlan
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      plan.foreach {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
          off += s"$name: CartesianProduct(${c.condition.map(_.sql)
            .getOrElse("<no condition>")})"
        case _ => ()
      }
    }
    off.toSeq.distinct
  }

  test("no query plans a CartesianProduct") {
    assert(offenders.isEmpty,
      s"${offenders.size} CartesianProduct site(s) — broadcast-hint the " +
        s"bounded side or restructure the join:\n" +
        offenders.mkString("\n"))
  }
}
