package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact order statistics — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition spec.
  *
  * An unpartitioned window moves the WHOLE relation into one task and
  * sorts it there (`WindowExec: No Partition Defined` — the executor-side
  * analog of a driver collect). That is fine for lattice-sized aggregates
  * but a scale killer on base-table-grain inputs: at 100 TB a single task
  * sorts the table. The reference never has this problem only because it
  * is single-node to begin with; a Spark-first engine must rank
  * distributively.
  *
  * Shape (the classic range-partitioned rank):
  *   1. `repartitionByRange` on the sort key — ONE balanced shuffle;
  *      partition i holds keys ≤ partition i+1's (RangePartitioner
  *      contract), so global order = (partition id, local order).
  *   2. sort within partitions (parallel, spill-safe) and read off the
  *      local position from `monotonically_increasing_id()` — documented
  *      bit layout: partition id in the upper bits, the record number
  *      within the partition in the lower 33.
  *   3. per-partition row counts / weight sums (map-side-combined
  *      aggregate, ≤ `parts` rows) → exclusive prefix offsets on the
  *      driver-sized table → broadcast-join back.
  *
  * Global rank = partition offset + local position: exact, no single-task
  * sort anywhere, and the only full-data movement is the one range
  * shuffle (the per-partition count branch reuses the exchange).
  *
  * Sort keys MUST be a total order (include a unique tiebreaker column)
  * — the same requirement the deterministic-output window forms already
  * carry. Boundaries sampled by RangePartitioner vary run-to-run, but
  * ranks are positions in the total order and thus independent of where
  * the cuts fall.
  *
  * Fault-tolerance contract: the frozen layout (see [[freeze]]) is a
  * `localCheckpoint` by default — blocks live on their executor, so a
  * lost executor fails the query with NO recompute path (batch-retry
  * semantics: rerun the job). For long-running or large-cluster jobs
  * set `spark.graft.ranks.checkpoint=reliable` to write the frozen
  * layout to the SparkContext checkpoint directory instead (survives
  * any executor loss; requires `sparkContext.setCheckpointDir`).
  * Rank/offset consistency holds identically in both modes — the
  * checkpoint is what pins ONE RangePartitioner boundary sample for
  * both plan branches.
  */
object Ranks {

  private val LocalIdxBits = 33
  private val LocalIdxMask = (1L << LocalIdxBits) - 1

  private def defaultParts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Freeze ONE physical layout for the plan's two consumers (offset
    * census + rank join): RangePartitioner samples its boundaries per
    * exchange materialization, so two independent evaluations of the
    * same plan could cut the range differently and de-sync offsets
    * from local positions (observed: ranks > n). Mode per the
    * fault-tolerance contract in the object scaladoc. */
  private def freeze(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.ranks.checkpoint", "local")
        == "reliable") {
      // Reliable checkpointing runs a SEPARATE job to write the
      // checkpoint files after the first action; without a persist
      // that job recomputes the whole lineage (range shuffle
      // included), doubling the frozen frame's first-use cost.
      // MEMORY_AND_DISK fills on the first action, the checkpoint
      // writer reads the cached blocks, and once the lineage is
      // truncated to the checkpoint files any evicted block re-reads
      // from reliable storage — the cache is a first-use accelerator,
      // never a correctness dependency. It stays registered until
      // evicted (LRU) or the session ends; there is no post-write
      // hook to unpersist on, which is the accepted cost of the
      // opt-in durable mode.
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .checkpoint(false)
    } else df.localCheckpoint(false)

  /** Append an exact 1-based global dense position `out` (row_number
    * semantics) over the total order `ord`. One balanced range shuffle;
    * every sort is per-partition. */
  def withGlobalRank(df: DataFrame, ord: Seq[Column], out: String,
                     parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts else defaultParts(df)
    val mid = col("_rk_mid")
    val parted = freeze(df
      .repartitionByRange(p, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("_rk_mid", monotonically_increasing_id())
      .withColumn("_rk_pid", shiftright(mid, LocalIdxBits))
      .withColumn("_rk_lrn", (mid.bitwiseAND(LocalIdxMask)) + 1L)
      .drop("_rk_mid"))
    // Exclusive per-partition count offsets in ONE bounded-state
    // aggregate (state ≤ `parts` entries) — no census window, no
    // single-task sort anywhere in this operator.
    val offsets = parted
      .agg(graft.functions.PrefixOffsetsAgg.prefixOffsets(
        col("_rk_pid"), Seq(lit(1L))).as("_rk_po"))
      .select(explode(col("_rk_po")).as("_rk_e"))
      .select(col("_rk_e.pid").as("_rk_pid"),
        col("_rk_e.off0").as("_rk_off"))
    parted.join(broadcast(offsets), "_rk_pid")
      .withColumn(out, col("_rk_off") + col("_rk_lrn"))
      .drop("_rk_pid", "_rk_lrn", "_rk_off")
  }

  /** Append an exact inclusive running sum `cw` of `w` over the total
    * order `ord` within each `grp` (cumulative-distribution form:
    * `SUM(w) OVER (PARTITION BY grp ORDER BY ord ROWS UNBOUNDED
    * PRECEDING)`), plus the group total `tw` — without sorting any group
    * in a single task. Group columns lead the range key, so a group
    * spans a contiguous partition range and the per-(partition, group)
    * offsets stay exact. `w` should be an exactly-summable type
    * (long / decimal) — the offsets are reduced across partitions.
    *
    * Costs two balanced shuffles (range + the (partition, group) window
    * hash) — still no single-task sort. Group keys must be non-null
    * (the offset join-back is an equality join). */
  def withPrefixSum(df: DataFrame, grp: Seq[Column], ord: Seq[Column],
                    w: Column, cw: String, tw: String,
                    parts: Int = 0): DataFrame =
    withPrefixSums(df, grp, ord, Seq((w, cw, tw)), parts)

  /** Multi-weight variant of [[withPrefixSum]]: each `(w, cw, tw)`
    * triple gets its running sum and group total in the SAME single
    * pass (one range shuffle, one per-partition sort) — e.g. a rank
    * (`w = 1`) alongside a cumulative-positives sum. */
  def withPrefixSums(df: DataFrame, grp: Seq[Column], ord: Seq[Column],
                     ws: Seq[(Column, String, String)],
                     parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts else defaultParts(df)
    val mid = col("_rk_mid")
    val wNames = ws.indices.map(i => s"_rk_w$i")
    // same single-layout freeze as withGlobalRank (see freeze())
    val parted = freeze(ws.zip(wNames).foldLeft(
        df.repartitionByRange(p, grp ++ ord: _*)
          .sortWithinPartitions(grp ++ ord: _*)) {
        case (d, ((w, _, _), n)) => d.withColumn(n, w)
      }
      .withColumn("_rk_mid", monotonically_increasing_id())
      .withColumn("_rk_pid", shiftright(mid, LocalIdxBits))
      .drop("_rk_mid"))
    val grpNames = grp.zipWithIndex.map { case (_, i) => s"_rk_g$i" }
    val tagged = grpNames.zip(grp).foldLeft(parted) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
    // local running sums: partitioned by the physical partition AND the
    // group (a partition may straddle group boundaries) — parallel sort
    val localW = Window
      .partitionBy((col("_rk_pid") +: grpNames.map(col)): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localled = wNames.foldLeft(tagged) { (d, n) =>
      d.withColumn(s"${n}_lcw", sum(col(n)).over(localW))
    }
    val offsets = if (grp.isEmpty) {
      // Global (no-group) offsets: ONE bounded-state aggregate (state
      // ≤ `parts` entries — see PrefixOffsetsAgg) replaces the census
      // + unpartitioned offsets window. No window node anywhere on
      // this path, so queries ranking through here need no
      // unpartitioned-window certification at all.
      tagged
        .agg(graft.functions.PrefixOffsetsAgg.prefixOffsets(
          col("_rk_pid"), wNames.map(col)).as("_rk_po"))
        .select(explode(col("_rk_po")).as("_rk_e"))
        .select(col("_rk_e.pid").as("_rk_pid") +:
          ws.zip(wNames).zipWithIndex.flatMap {
            case (((_, _, tw), n), i) =>
              Seq(col(s"_rk_e.off$i").as(s"${n}_off"),
                col(s"_rk_e.tot$i").as(tw))
          }: _*)
    } else {
      // per-(partition, group) totals: ≤ parts × (groups straddling)
      // rows. Taken from the PRE-window frame so this branch shares
      // the range exchange but never re-runs the window sort. The
      // offsets window is PARTITIONED by the group keys — never a
      // single-task sort.
      val partTotals = tagged
        .groupBy((col("_rk_pid") +: grpNames.map(col)): _*)
        .agg(sum(col(wNames.head)).as(s"${wNames.head}_pw"),
          wNames.tail.map(n => sum(col(n)).as(s"${n}_pw")): _*)
      val offW = Window.partitionBy(grpNames.map(col): _*)
        .orderBy(col("_rk_pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val twW = Window.partitionBy(grpNames.map(col): _*)
      val offsets0 = ws.zip(wNames).foldLeft(partTotals) {
        case (d, ((_, _, tw), n)) =>
          d.withColumn(s"${n}_off", coalesce(sum(col(s"${n}_pw")).over(offW),
              lit(0L).cast(partTotals.schema(s"${n}_pw").dataType)))
            .withColumn(tw, sum(col(s"${n}_pw")).over(twW))
      }
      offsets0.select(
        (col("_rk_pid") +: grpNames.map(col)) ++
          wNames.map(n => col(s"${n}_off")) ++ ws.map(t => col(t._3)): _*)
    }
    val joined = localled.join(broadcast(offsets), "_rk_pid" +: grpNames)
    ws.zip(wNames).foldLeft(joined) {
        case (d, ((_, cw, _), n)) =>
          d.withColumn(cw, col(s"${n}_off") + col(s"${n}_lcw"))
      }
      .drop((Seq("_rk_pid") ++ grpNames ++
        wNames.flatMap(n => Seq(n, s"${n}_lcw", s"${n}_off"))): _*)
  }

  /** Append the doubled average midrank `out` of `value` within `grp`
    * (2·avgrank = 2·minrank + ties − 1 — integral, so rank sums stay
    * exact under ties). Midranks depend only on the VALUE, so this
    * ranks the (grp, value) CENSUS — a [[withPrefixSum]] over census
    * rows, 2·cum − ties + 1 — and joins back on (grp, value), never
    * sorting data-grain rows in one task. The partitioned-rank window
    * it replaces caps parallelism at |grp| tasks; here every stage is
    * hash- or range-partitioned on data-scaled keys.
    *
    * Precondition: `grp` and `value` must be NON-NULL — the join-back
    * is an equality join, so a NULL value row would be silently dropped
    * (a rank window would have ordered it NULLS FIRST/LAST instead). */
  def withMidrank2(df: DataFrame, grp: Seq[Column], value: Column,
                   out: String, parts: Int = 0): DataFrame =
    withMidrank2s(df, grp, Seq((value, out)), parts)

  /** Multi-value variant of [[withMidrank2]]: each `(value, out)` pair
    * gets its doubled midrank, but the per-value censuses are UNIONED
    * (tagged by value index) into ONE prefix-sum pass — one range
    * shuffle and one offsets aggregate instead of one per value. All
    * value columns must share one data type (the union stacks them in
    * a single column). The join-backs stay per-value (each value needs
    * its own (grp, value) equality), chained in the main job. */
  def withMidrank2s(df: DataFrame, grp: Seq[Column],
                    values: Seq[(Column, String)],
                    parts: Int = 0): DataFrame = {
    val gNames = grp.indices.map(i => s"_mr_g$i")
    val vNames = values.indices.map(j => s"_mr_v$j")
    val tagged = vNames.zip(values).foldLeft(
      gNames.zip(grp).foldLeft(df) {
        case (d, (n, c)) => d.withColumn(n, c)
      }) { case (d, (n, (v, _))) => d.withColumn(n, v) }
    val vTypes = vNames.map(n => tagged.schema(n).dataType)
    require(vTypes.distinct.size <= 1,
      s"withMidrank2s: all value columns must share one data type " +
        s"(the unioned census stacks them in a single column); got " +
        vTypes.map(_.sql).mkString(", "))
    val census = values.indices.map { j =>
        tagged.groupBy((gNames :+ vNames(j)).map(col): _*)
          .agg(count(lit(1)).as("_mr_tc"))
          .select((gNames.map(col) :+ lit(j).as("_mr_which") :+
            col(vNames(j)).as("_mr_v") :+ col("_mr_tc")): _*)
      }.reduce(_ unionByName _)
    val cum = withPrefixSum(census, (gNames :+ "_mr_which").map(col),
        Seq(col("_mr_v")), col("_mr_tc"), "_mr_cw", "_mr_tw", parts)
      .select((gNames :+ "_mr_which" :+ "_mr_v").map(col) :+
        (lit(2L) * col("_mr_cw") - col("_mr_tc") + 1L).as("_mr_out"): _*)
    values.zipWithIndex.foldLeft(tagged) { case (d, ((_, out), j)) =>
        d.join(cum.where(col("_mr_which") === j)
            .select((gNames.map(col) :+ col("_mr_v").as(vNames(j)) :+
              col("_mr_out").as(out)): _*),
          (gNames :+ vNames(j)).toSeq)
      }
      .drop((gNames ++ vNames): _*)
  }

  /** Exact SQL `NTILE(k)` bucket from a 1-based rank and the total row
    * count: the first `n mod k` buckets get `⌈n/k⌉` rows, the rest
    * `⌊n/k⌋`. Arithmetic is exact for n < 2^53 (floor-div via doubles;
    * a 100 TB relation is ~10^12 rows, 3 orders of magnitude inside). */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val kk = lit(k.toLong)
    val q = floor(n / kk).cast("long")          // ⌊n/k⌋
    val r = n - q * kk                           // n mod k
    val bigSpan = r * (q + 1L)                   // rows covered by big buckets
    when(rank <= bigSpan, floor((rank - 1L) / (q + 1L)).cast("long") + 1L)
      .otherwise(r + floor((rank - bigSpan - 1L) / q).cast("long") + 1L)
      .cast("int")
  }
}
