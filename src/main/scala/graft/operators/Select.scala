package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed SELECTION (k-th order statistics, weighted-median
  * crossings) by bounded histogram refinement — the cheap sibling of
  * [[Ranks]] for queries that need a few order statistics rather than a
  * rank on every row.
  *
  * [[Ranks.withGlobalRank]] range-shuffles the full relation, freezes a
  * layout (localCheckpoint) and joins offsets back — the right shape
  * when EVERY row needs its rank (ntile labels, CDF columns). When the
  * query only reads off O(1) order statistics (a median pair, a MAD, a
  * handful of quantile crossings), selection does it with NO row-level
  * shuffle at all: each round is one map-side-combined aggregation over
  * an integer column, the driver keeps ≤ `buckets` counters (bounded by
  * CONSTRUCTION, not by data — the q121/q207 metadata-collect class),
  * and the value range shrinks `buckets`-fold per round. Any int64
  * domain resolves in ≤ ⌈64 / log₂(buckets)⌉ rounds (5 at the default
  * 2^13 buckets — sized so each round's driver collect stays ~10k
  * rows, which costs less than the extra sub-0.1s scan it buys);
  * money-cent grids (< 2^27) in 2. At 100 TB that is 2–3 column scans with partial
  * aggregation versus a full-row range exchange — scans beat shuffles,
  * and nothing about the driver state grows with data.
  *
  * The classic two-round distributed selection (Blum et al.'s ideas in
  * histogram form, as used by every MPP `approx_percentile` made exact).
  */
object Select {

  /** One aggregation job: row count + min/max of a long column.
    * Null x rows are ignored (documented: selection is over the
    * non-null domain, matching ROW_NUMBER over a non-null input). */
  final case class LongStats(n: Long, lo: Long, hi: Long)

  def longStats(df: DataFrame, x: Column): LongStats = {
    val r = df.where(x.isNotNull)
      .agg(count(lit(1)), min(x.cast("long")), max(x.cast("long"))).head()
    if (r.isNullAt(1)) LongStats(0L, 0L, 0L)
    else LongStats(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Collect a histogram whose cardinality is bounded BY CONSTRUCTION
    * (the bucket key is `(x - lo) >> shift` with shift chosen so the
    * bucket id ranges over ≤ `bound` values — a mathematical bound,
    * not a data assumption). One plain collect job: `limit()`-guarded
    * collects (Lattice.collectBounded) pay CollectLimit's incremental
    * partition escalation, 2-4 extra jobs per refinement round. The
    * post-hoc require documents the invariant. */
  private val trace = sys.env.contains("SPARK_GRAFT_SELECT_TRACE")

  private def timed[A](tag: String)(f: => A): A =
    if (!trace) f else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(
        f"[select] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  private def collectHist(df: DataFrame, bound: Long, why: String): Array[Row] = {
    val rows = df.collect()
    require(rows.length <= bound,
      s"selection histogram '$why' broke its construction bound ($bound)")
    rows
  }

  private def widthOf(lo: Long, hi: Long): BigInt = BigInt(hi) - BigInt(lo) + 1

  private def shiftFor(lo: Long, hi: Long, buckets: Int): Int = {
    var s = 0
    while ((widthOf(lo, hi) >> s) > buckets) s += 1
    s
  }

  /** Coarse rounds bucket on the ABSOLUTE grid `x >> s` (arithmetic
    * shift = floor division by 2^s, defined for every long including
    * the Long.Min/Max corners) — an offset-relative `x - lo` overflows
    * under ANSI mode once an interval spans more than half the int64
    * line (caught by SelectPropertySpec's extreme-spread domain). The
    * absolute grid costs ≤ 1 extra bucket per interval. */
  /** Worst-case refinement depth: the span shrinks `buckets`-fold per
    * round, so ⌈64 / log₂ buckets⌉ rounds resolve any int64 domain;
    * +4 slack for the exact-wait and hint rounds. */
  private def maxRounds(buckets: Int): Int =
    64 / (31 - Integer.numberOfLeadingZeros(buckets)).max(1) + 4

  private def narrowTo(lo: Long, hi: Long, b: Long, shift: Int): (Long, Long) = {
    val base = b << shift
    val top = (BigInt(base) + (BigInt(1) << shift) - 1).min(BigInt(hi)).toLong
    (math.max(lo, base), top)
  }

  /** Exact k-th smallest values (1-based `ks`, each in [1, n]) of long
    * column `x`. Each k keeps its own shrinking interval, so distant
    * ks (e.g. p1 and p99) still converge in ≤ 4 rounds; at most one
    * aggregation job per round regardless of |ks| (intervals share a
    * scan via a CASE-tagged bucket key). `ks` must be ≤ 16 (the driver
    * walks |ks| × buckets counters). */
  def kthLong(df: DataFrame, x: Column, ks: Seq[Long],
              stats: Option[LongStats] = None,
              buckets: Int = 1 << 13): Map[Long, Long] = {
    require(ks.nonEmpty && ks.size <= 16, s"kthLong: 1..16 ks, got ${ks.size}")
    val st = timed("kth.stats")(stats.getOrElse(longStats(df, x)))
    require(ks.forall(k => k >= 1 && k <= st.n),
      s"kthLong: ks must be in [1, ${st.n}], got $ks")
    val xc = x.cast("long")
    val data = df.select(xc.as("_sx")).where(col("_sx").isNotNull)
    // state per k: (lo, hi, rows below lo)
    var state: Map[Long, (Long, Long, Long)] =
      ks.distinct.map(k => k -> (st.lo, st.hi, 0L)).toMap
    var out = Map.empty[Long, Long]
    var rounds = 0
    while (state.nonEmpty) {
      rounds += 1
      require(rounds <= maxRounds(buckets),
        "kthLong: refinement failed to converge")
      // distinct intervals this round (ks often share one)
      val intervals = state.values.map { case (lo, hi, _) => (lo, hi) }
        .toSeq.distinct.sortBy(_._1)
      // an interval up to 4x buckets wide is collected exactly rather
      // than refined again: the exact round returns only the DISTINCT
      // values present, and one slightly larger collect is cheaper
      // than another full scan of the relation
      val exactW = buckets.toLong * 4
      // one job: per interval i, bucket = exact value (narrow) or
      // (x - lo) >> shift (wide); tag rows with their interval index
      val tagged = intervals.zipWithIndex.map { case ((lo, hi), i) =>
        val in = col("_sx") >= lo && col("_sx") <= hi
        val b =
          if (widthOf(lo, hi) <= exactW) col("_sx") - lo
          else shiftright(col("_sx"), shiftFor(lo, hi, buckets))
        (in, lit(i), b)
      }
      val iv = tagged.foldRight(lit(null).cast("int")) { case ((in, i, _), e) =>
        when(in, i).otherwise(e) }
      val bk = tagged.foldRight(lit(null).cast("long")) { case ((in, _, b), e) =>
        when(in, b).otherwise(e) }
      val hist = timed(s"kth.round$rounds")(collectHist(
        data.where(iv.isNotNull)
          .groupBy(iv.as("_iv"), bk.as("_bk")).agg(count(lit(1)).as("_c")),
        intervals.size.toLong * (exactW + 1),
        "Select.kthLong (intervals x buckets)"))
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (i, rs) =>
          i -> rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq }
      val next = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      state.foreach { case (k, (lo, hi, below)) =>
        val i = intervals.indexOf((lo, hi))
        val bs = hist.getOrElse(i, Seq.empty)
        var cum = below
        var hit = false
        val isExact = widthOf(lo, hi) <= exactW
        val shift = if (isExact) 0 else shiftFor(lo, hi, buckets)
        val it = bs.iterator
        while (it.hasNext && !hit) {
          val (b, c) = it.next()
          if (cum + c >= k) {
            if (isExact) out += k -> (lo + b)
            else {
              val (nlo, nhi) = narrowTo(lo, hi, b, shift)
              next(k) = (nlo, nhi, cum)
            }
            hit = true
          }
          cum += c
        }
        require(hit, s"Select.kthLong: rank $k not found (cum=$cum)")
      }
      state = next.toMap
    }
    out
  }

  /** Exact weighted QUANTILE crossings (ungrouped): for each rational
    * target num/den, the smallest x with W(≤x)·den ≥ W_total·num —
    * plus the exact max x as the (1, 1) target. One aggregation when
    * the hinted domain is exact-collectable (≤ 4·buckets values, e.g.
    * a concurrency-level axis) AND every crossing lands inside the
    * hint; refinement rounds otherwise, exactly as [[kthLong]].
    * Round 0 buckets out-of-hint values on the GLOBAL coarse grid
    * (`x >> shiftFor(int64, buckets)`), side-tagged below/above the
    * hint, so the collect bound is `exactW + 2·buckets + 64` BY
    * CONSTRUCTION for any data — a wrong hint costs refinement
    * rounds, never a failure. Weights must be exactly summable
    * (long/decimal). Empty input (total weight 0) returns the empty
    * map — callers decide what an order statistic of nothing means.
    * Returns target → crossing x. */
  def weightedQuantilesLong(df: DataFrame, x: Column, w: Column,
                            targets: Seq[(Long, Long)],
                            domainHint: (Long, Long),
                            buckets: Int = 1 << 13): Map[(Long, Long), Long] = {
    require(targets.nonEmpty && targets.size <= 16)
    require(targets.forall { case (n, d) => n >= 0 && d > 0 && n <= d })
    val data = df.select(x.cast("long").as("_sx"), w.as("_w"))
      .where(col("_sx").isNotNull)
    def dec(a: Any): BigDecimal = a match {
      case d: java.math.BigDecimal => BigDecimal(d)
      case l: java.lang.Long => BigDecimal(l)
      case i: java.lang.Integer => BigDecimal(i.intValue())
      case other => throw new IllegalArgumentException(
        s"weightedQuantilesLong: non-exact weight type ${other.getClass}")
    }
    val (hlo, hhi) = domainHint
    require(hlo <= hhi, s"weightedQuantilesLong: bad hint [$hlo, $hhi]")
    val exactW = buckets.toLong * 4
    // round 0: side-tagged two-grid histogram, unfiltered. In-hint
    // values bucket on the hint grid (the value itself when the hint
    // is exact-narrow, x >> s otherwise); out-of-hint values bucket on
    // the GLOBAL coarse grid, tagged −1 (below hint) / +1 (above), so
    // they sort before/after every in-hint entry and the collect stays
    // ≤ exactW + 2·buckets + 64 rows by construction — the hint is an
    // efficiency contract only, never a bound assumption. A crossing
    // landing in an out-of-hint coarse bucket refines like any other
    // interval (clipped to its side so refinement never re-counts
    // weight already attributed to the other grids).
    val exact0 = widthOf(hlo, hhi) <= exactW
    val shift0 = if (exact0) 0 else shiftFor(hlo, hhi, buckets)
    val gshift = shiftFor(Long.MinValue, Long.MaxValue, buckets)
    val side = when(col("_sx") < hlo, lit(-1))
      .when(col("_sx") > hhi, lit(1)).otherwise(lit(0))
    // absolute grids throughout (x itself or x >> s): defined for
    // every long, no offset subtraction to overflow
    val bkIn =
      if (exact0) col("_sx")
      else shiftright(col("_sx"), shift0)
    val bk0 = when(side === 0, bkIn)
      .otherwise(shiftright(col("_sx"), gshift))
    val h0 = timed("wq.round0")(collectHist(
      data.groupBy(side.as("_sd"), bk0.as("_bk"))
        .agg(sum(col("_w")).as("_ws")),
      exactW + 2L * buckets + 64, "Select.weightedQuantilesLong round 0"))
      .map(r => (r.getInt(0), r.getLong(1), dec(r.get(2))))
      .sortBy(t => (t._1, t._2)) // (side, bucket) = global value order
    val tot = h0.iterator.map(_._3).foldLeft(BigDecimal(0))(_ + _)
    if (tot == 0) return Map.empty // empty input: nothing to select
    var out = Map.empty[(Long, Long), Long]
    // state per target: (lo, hi, weight below lo)
    var state = Map.empty[(Long, Long), (Long, Long, BigDecimal)]
    targets.distinct.foreach { case (num, den) =>
      var cum = BigDecimal(0)
      var hit = false
      val it = h0.iterator
      while (it.hasNext && !hit) {
        val (sd, b, ws) = it.next()
        if ((cum + ws) * BigDecimal(den) >= tot * BigDecimal(num)) {
          if (sd == 0 && exact0) out += (num, den) -> b
          else {
            // clip the refinement interval to this entry's side so
            // round-1's range scan sees exactly the rows this bucket
            // counted (sides share absolute grids but not value ranges)
            val (clo, chi) =
              if (sd < 0) (Long.MinValue, hlo - 1)
              else if (sd > 0) (hhi + 1, Long.MaxValue)
              else (hlo, hhi)
            val (nlo, nhi) =
              narrowTo(clo, chi, b, if (sd == 0) shift0 else gshift)
            state += (num, den) -> (nlo, nhi, cum)
          }
          hit = true
        }
        cum += ws
      }
      require(hit, s"weightedQuantilesLong: no crossing for $num/$den")
    }
    var rounds = 0
    while (state.nonEmpty) {
      rounds += 1
      require(rounds <= maxRounds(buckets),
        "weightedQuantilesLong: failed to converge")
      val intervals = state.values.map { case (lo, hi, _) => (lo, hi) }
        .toSeq.distinct.sortBy(_._1)
      val tagged = intervals.zipWithIndex.map { case ((lo, hi), i) =>
        val in = col("_sx") >= lo && col("_sx") <= hi
        val b =
          if (widthOf(lo, hi) <= exactW) col("_sx") - lo
          else shiftright(col("_sx"), shiftFor(lo, hi, buckets))
        (in, lit(i), b)
      }
      val iv = tagged.foldRight(lit(null).cast("int")) { case ((in, i, _), e) =>
        when(in, i).otherwise(e) }
      val bk = tagged.foldRight(lit(null).cast("long")) { case ((in, _, b), e) =>
        when(in, b).otherwise(e) }
      val hist = timed(s"wq.round$rounds")(collectHist(
        data.where(iv.isNotNull)
          .groupBy(iv.as("_iv"), bk.as("_bk")).agg(sum(col("_w")).as("_ws")),
        intervals.size.toLong * (exactW + 1),
        "Select.weightedQuantilesLong (intervals x buckets)"))
        .map(r => (r.getInt(0), r.getLong(1), dec(r.get(2))))
        .groupBy(_._1)
        .map { case (i, rs) =>
          i -> rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq }
      var next = Map.empty[(Long, Long), (Long, Long, BigDecimal)]
      state.foreach { case (t @ (num, den), (lo, hi, below)) =>
        val i = intervals.indexOf((lo, hi))
        val bs = hist.getOrElse(i, Seq.empty)
        var cum = below
        var hit = false
        val isExact = widthOf(lo, hi) <= exactW
        val shift = if (isExact) 0 else shiftFor(lo, hi, buckets)
        val it = bs.iterator
        while (it.hasNext && !hit) {
          val (b, ws) = it.next()
          if ((cum + ws) * BigDecimal(den) >= tot * BigDecimal(num)) {
            if (isExact) out += t -> (lo + b)
            else {
              val (nlo, nhi) = narrowTo(lo, hi, b, shift)
              next += t -> (nlo, nhi, cum)
            }
            hit = true
          }
          cum += ws
        }
        require(hit, s"weightedQuantilesLong: lost crossing for $num/$den")
      }
      state = next
    }
    out
  }

  /** Exact weighted-median CROSSING per group: the smallest x with
    * 2·W(≤x) ≥ W_total under exactly-summable weights (long / decimal)
    * — the `cw >= tw - cw` crossing row of the cumulative-distribution
    * form, read off per group without ranking any row. Returns one row
    * per group: (group values…, crossing x, carry at the crossing,
    * W_total). `carry` must be functionally determined by (group, x)
    * (e.g. the un-quantized double the long grid was derived from);
    * the exact round reads it with min() for determinism. Group count
    * must be bounded (≤ `maxGroups`) — group values live on the driver
    * like any lattice.
    *
    * `domainHint = Some((lo, hi))` fuses the stats job into round 1:
    * the first histogram buckets on the ABSOLUTE grid
    * `(x − lo) >> shift` with NO range filter, so group keys, totals
    * and the crossing bucket all come out of one aggregation. The hint
    * is an efficiency contract only, never a correctness one — values
    * outside it still land in (out-of-range) buckets and are counted;
    * a hint so wrong that the bucket count breaks its bound fails
    * loudly in collectHist. Use for documented grids (money cents,
    * counts). */
  def weightedCrossings(df: DataFrame, grp: Seq[Column], x: Column,
                        carry: Column, w: Column,
                        maxGroups: Int = 64,
                        buckets: Int = 1 << 13,
                        domainHint: Option[(Long, Long)] = None)
      : Seq[(Seq[Any], Long, Any, Any)] = {
    val data = df.select((grp :+ x.cast("long").as("_sx") :+
      carry.as("_cy") :+ w.as("_w")): _*).where(col("_sx").isNotNull)
    val gnames = grp.indices.map(i => data.columns(i))
    def gcols = gnames.map(col)
    // state per group: (lo, hi, weight below lo)
    final case class G(key: List[Any], lo: Long, hi: Long, tw: BigDecimal,
                       below: BigDecimal)
    def dec(a: Any): BigDecimal = a match {
      case d: java.math.BigDecimal => BigDecimal(d)
      case l: java.lang.Long => BigDecimal(l)
      case i: java.lang.Integer => BigDecimal(i.intValue())
      // java.lang.Double deliberately NOT accepted: a float weight sum
      // depends on partial-aggregation order, so the crossing row could
      // flip between runs — cast weights to decimal at the call site
      case other => throw new IllegalArgumentException(
        s"weightedCrossings: non-exact weight type ${other.getClass}")
    }
    var out = List.empty[(Seq[Any], Long, Any, Any)]
    var state: Seq[G] = Seq.empty
    var totals: Map[List[Any], Any] = Map.empty
    domainHint match {
      case Some((hlo, hhi)) =>
        // fused round: one unfiltered aggregation discovers the groups,
        // their totals AND the crossing bucket of each
        val exact0 = widthOf(hlo, hhi) <= buckets.toLong * 4
        val shift0 = if (exact0) 0 else shiftFor(hlo, hhi, buckets)
        // absolute grid (x itself when exact, x >> s when coarse):
        // defined for every long, no offset arithmetic to overflow,
        // negative values floor-divide correctly under the arithmetic
        // shift — out-of-hint values simply occupy extra bucket ids
        val bk0safe =
          if (exact0) col("_sx")
          else shiftright(col("_sx"), shift0)
        val agg0 =
          if (exact0) Seq(sum(col("_w")).as("_ws"), min(col("_cy")).as("_cy"))
          else Seq(sum(col("_w")).as("_ws"))
        val hist0 = timed("wc.round0")(collectHist(
          data.groupBy((gcols :+ bk0safe.as("_bk")): _*)
            .agg(agg0.head, agg0.tail: _*),
          maxGroups.toLong * (buckets + 2) + 64,
          "Select.weightedCrossings hinted round (groups x buckets)"))
        val byKey0 = hist0.groupBy(r => gnames.indices.map(r.get).toList)
        require(byKey0.size <= maxGroups,
          s"weightedCrossings: ${byKey0.size} groups > maxGroups=$maxGroups")
        byKey0.foreach { case (key, rows) =>
          val rs = rows.map { r =>
            (r.getLong(gnames.size), dec(r.get(gnames.size + 1)),
              if (exact0) r.get(gnames.size + 2) else null)
          }.sortBy(_._1)
          val tw = rs.iterator.map(_._2).foldLeft(BigDecimal(0))(_ + _)
          totals += key -> tw
          var cum = BigDecimal(0)
          var hit = false
          val it = rs.iterator
          while (it.hasNext && !hit) {
            val (b, ws, cy) = it.next()
            if ((cum + ws) * 2 >= tw) {
              if (exact0) out ::= ((key, b, cy, tw))
              else {
                val (nlo, nhi) =
                  narrowTo(Long.MinValue, Long.MaxValue, b, shift0)
                state = state :+ G(key, nlo, nhi, tw, cum)
              }
              hit = true
            }
            cum += ws
          }
          require(hit, s"weightedCrossings: no crossing for group $key")
        }
      case None =>
        // round 0: per-group stats + total weight (one job)
        val stats = timed("wc.stats")(Lattice.collectBounded(
          data.groupBy(gcols: _*).agg(min(col("_sx")).as("_lo"),
            max(col("_sx")).as("_hi"), sum(col("_w")).as("_tw")),
          maxGroups, "Select.weightedCrossings group stats"))
        state = stats.map { r =>
          val key = gnames.indices.map(r.get).toList
          G(key, r.getLong(gnames.size), r.getLong(gnames.size + 1),
            dec(r.get(gnames.size + 2)), BigDecimal(0))
        }.toSeq
        totals = stats.map(r => gnames.indices.map(r.get).toList ->
          r.get(gnames.size + 2)).toMap
    }
    var rounds = 0
    while (state.nonEmpty) {
      rounds += 1
      require(rounds <= maxRounds(buckets),
        "weightedCrossings: refinement failed to converge")
      val preds = state.map { g =>
        val keyPred = gcols.zip(g.key).map { case (c, v) => c <=> lit(v) }
          .reduceOption(_ && _).getOrElse(lit(true))
        (g, keyPred && col("_sx") >= g.lo && col("_sx") <= g.hi)
      }
      val anyPred = preds.map(_._2).reduce(_ || _)
      val exactW = buckets.toLong * 4
      val exactRound = state.forall(g => widthOf(g.lo, g.hi) <= exactW)
      val bk = preds.foldRight(lit(null).cast("long")) { case ((g, p), e) =>
        val b =
          if (widthOf(g.lo, g.hi) <= exactW) col("_sx") - g.lo
          else shiftright(col("_sx"), shiftFor(g.lo, g.hi, buckets))
        when(p, b).otherwise(e)
      }
      val aggCols =
        if (exactRound) Seq(sum(col("_w")).as("_ws"), min(col("_cy")).as("_cy"))
        else Seq(sum(col("_w")).as("_ws"))
      val hist = timed(s"wc.round$rounds")(collectHist(
        data.where(anyPred)
          .groupBy((gcols :+ bk.as("_bk")): _*).agg(aggCols.head, aggCols.tail: _*),
        state.size.toLong * (buckets.toLong * 4 + 1),
        "Select.weightedCrossings (groups x buckets)"))
      val byKey = hist.groupBy(r => gnames.indices.map(r.get).toList)
      val next = scala.collection.mutable.ListBuffer.empty[G]
      state.foreach { g =>
        // a group that is already exact-width waits for the all-exact
        // round (the carry column is only aggregated then); its state
        // is unchanged, so it adds at most one round overall
        if (widthOf(g.lo, g.hi) <= exactW && !exactRound) {
          next += g
        } else {
        val rs = byKey.getOrElse(g.key, Array.empty[Row]).toSeq
          .map { r =>
            val b = r.getLong(gnames.size)
            val ws = dec(r.get(gnames.size + 1))
            val cy = if (exactRound) r.get(gnames.size + 2) else null
            (b, ws, cy)
          }.sortBy(_._1)
        var cum = g.below
        var hit = false
        val isExact = widthOf(g.lo, g.hi) <= exactW
        val shift = if (isExact) 0 else shiftFor(g.lo, g.hi, buckets)
        val it = rs.iterator
        while (it.hasNext && !hit) {
          val (b, ws, cy) = it.next()
          if ((cum + ws) * 2 >= g.tw) {
            if (isExact) out ::= ((g.key, g.lo + b, cy, totals(g.key)))
            else {
              val (nlo, nhi) = narrowTo(g.lo, g.hi, b, shift)
              next += G(g.key, nlo, nhi, g.tw, cum)
            }
            hit = true
          }
          cum += ws
        }
        require(hit, s"weightedCrossings: no crossing for group ${g.key}")
        }
      }
      state = next.toList
    }
    out.reverse
  }
}
