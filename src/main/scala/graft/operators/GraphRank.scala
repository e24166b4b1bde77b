package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over an edge list — the link-analysis /
  * entity-importance operator (Page et al. 1999) in the Pregel
  * iterate-join shape (Malewicz et al. 2010).
  *
  * Determinism discipline: ranks are BIGINT micro-units (1.0 =
  * 1,000,000), contributions use integer floor division, and the
  * damping update is `150000 + (85 · Σcontrib) div 100` — all-integer
  * arithmetic, so every iteration is exact and partition-order-free,
  * and a DuckDB oracle can unroll the identical chain. The floor
  * division leaks a few units of mass per node per iteration, which
  * is deterministic and identical in both engines.
  *
  * Scale shape: each iteration is one equi-join of the edge list with
  * the current rank vector on `src` plus one `groupBy(dst)` — the
  * standard BSP step. The edge list and degree table are computed
  * once and persisted (they're reused every iteration); both joins
  * key on `src`, so the shuffle partitioning is reused across
  * iterations. Iteration count is fixed (power iteration with d=0.85
  * contracts by 0.85^i; 6 rounds is a ranking-stable truncation, and
  * a fixed count is what makes the unrolled oracle possible).
  */
object GraphRank {

  val Unit6: Long = 1000000L

  /** Out-degree table for [[fixedPointPageRank]] — callers should
    * cache this (and the edge list) once per dataset: both are reused
    * by every iteration. */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src")).agg(count(lit(1)).as("d"))

  /** `edges(src, dst)` must already contain both directions for an
    * undirected graph; `deg` is [[degrees]](edges), passed in so the
    * caller can persist both across the iterations. Returns
    * `node, rank_units` for the `topK` highest-ranked nodes (ties
    * toward smaller node id). */
  def fixedPointPageRank(edges: DataFrame, deg: DataFrame,
                         iters: Int, topK: Int,
                         broadcastRanks: Boolean = false): DataFrame = {
    require(iters >= 1 && topK >= 1, s"need iters/topK >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // the rank vector is node-sized; localCheckpoint every third
    // iteration keeps the plan flat (Catalyst analysis over the nested
    // join chain grows superlinearly in `iters` otherwise; measured:
    // every-3 beats both every-1 and never on the q122 graph).
    // `broadcastRanks` is the small-graph switch — with it (and a
    // broadcastable `deg`) the edge list never shuffles; at
    // billion-node scale leave it off.
    // EAGER on purpose (r12 re-measured): lazy truncates the plan just
    // as well, but concurrent consumer stages then race to compute the
    // unmaterialized RDD before its cache fills (q122 +184% lazy).
    def flat(df: DataFrame, i: Int): DataFrame =
      if (i % 3 == 0) df.localCheckpoint(true) else df
    var rank = deg.select(col("src").as("node"), lit(Unit6).as("r"))
    for (i <- 1 to iters) {
      val rv = rank
      rank = flat(e
        .join(if (broadcastRanks) broadcast(rv) else rv,
          e("src") === rv("node"))
        .join(if (broadcastRanks) broadcast(deg) else deg, Seq("src"))
        .select(col("dst"), expr("r div d").as("contrib"))
        .groupBy(col("dst"))
        .agg((lit(150000L) + expr("85 * sum(contrib) div 100")).as("r"))
        .select(col("dst").as("node"), col("r")), i)
    }
    rank.orderBy(desc("r"), asc("node")).limit(topK)
      .select(col("node"), col("r").as("rank_units"))
  }

  /** DuckDB mirror of [[fixedPointPageRank]]: the iteration chain
    * unrolled as CTEs over an `eo(c, s)` bipartite pair CTE (both
    * directions are added here, matching the Spark caller). */
  def pageRankSql(eoCte: String, iters: Int, topK: Int): String = {
    val base =
      s"""WITH eo AS ($eoCte),
         |edges AS (
         |  SELECT c AS src, s AS dst FROM eo
         |  UNION ALL
         |  SELECT s AS src, c AS dst FROM eo
         |), deg AS (
         |  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
         |), r0 AS (
         |  SELECT src AS node, CAST($Unit6 AS BIGINT) AS r FROM deg
         |)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    CAST(150000 + (85 * CAST(SUM(p.r // d.d) AS BIGINT)) // 100 AS BIGINT) AS r
         |  FROM edges e
         |  JOIN r${i - 1} p ON e.src = p.node
         |  JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst
         |)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT node, r AS rank_units FROM r$iters " +
      s"ORDER BY rank_units DESC, node LIMIT $topK"
  }

  /** Bounded-depth BFS reachability: for every seed, the number of
    * distinct nodes within `hops` edge traversals (the seed itself
    * excluded). Classic Pregel frontier expansion: each hop joins only
    * the NEW frontier against the edge list on `src` (the partitioning
    * is reused across hops), anti-joins the visited set to keep the
    * frontier minimal, and unions into visited. Depth is fixed, so
    * the whole expansion is one static plan an oracle can unroll.
    *
    * `edges(src, dst)` must contain both directions for undirected
    * graphs; `seeds` is one column `seed`. Returns (seed, reach). */
  def kHopReach(edges: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    require(hops >= 1, s"hops must be >= 1, got $hops")
    var visited = seeds.select(col("seed"), col("seed").as("node"))
    var frontier = visited
    for (_ <- 1 to hops) {
      // persist each frontier: it is referenced twice (expansion join
      // + visited union) and sits under every later hop's anti-join —
      // without it the lazy lineage re-executes all prior hops
      val nxt = frontier.join(edges, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node"))
        .distinct()
        .join(visited, Seq("seed", "node"), "left_anti")
        .localCheckpoint(true) // truncate lineage: Catalyst analysis
        // cost over the growing hop chain otherwise dominates the run.
        // EAGER on purpose (r12 re-measured): lazy lets the expansion
        // join and the later anti-joins race to compute the hop RDD
        // before its cache fills (q127 +67% lazy).
      visited = visited.unionByName(nxt)
      frontier = nxt
    }
    visited.where(col("node") =!= col("seed"))
      .groupBy(col("seed")).agg(count(lit(1)).as("reach"))
  }

  /** DuckDB mirror of [[kHopReach]]: unrolled CTE chain over
    * `edgesCte` (must yield edges(src, dst), both directions) and
    * `seedsCte` (must yield seeds(seed)). */
  def kHopSql(edgesCte: String, seedsCte: String, hops: Int): String = {
    val base =
      s"""WITH edges AS ($edgesCte),
         |seeds AS ($seedsCte),
         |r0 AS (SELECT seed, seed AS node FROM seeds)""".stripMargin
    val steps = (1 to hops).map { i =>
      s"""r$i AS (
         |  SELECT DISTINCT seed, node FROM (
         |    SELECT seed, node FROM r${i - 1}
         |    UNION ALL
         |    SELECT r.seed, e.dst AS node
         |    FROM r${i - 1} r JOIN edges e ON r.node = e.src))""".stripMargin
    }.mkString(",\n")
    s"$base,\n$steps\n" +
      s"SELECT seed, CAST(COUNT(*) AS BIGINT) AS reach FROM r$hops " +
      "WHERE node <> seed GROUP BY seed ORDER BY seed"
  }

  /** Synchronous label propagation (Raghavan 2007) with a
    * deterministic tiebreak: labels start as node ids; each round
    * every node adopts the most frequent label among its neighbors'
    * PREVIOUS labels, ties toward the smaller label. Synchronous
    * update + total tiebreak make the fixed-iteration run exactly
    * reproducible (asynchronous LPA is run-order dependent — useless
    * for an oracle).
    *
    * Scale shape: per round, one equi-join of the edge list with the
    * label vector on `dst` and two key-partitioned aggregations
    * ((node, label) counts, then per-node argmax via a `max(struct)`
    * partial aggregate — no window). Iterations bounded.
    *
    * `edges(src, dst)` must contain both directions. Returns
    * (node, community) after `iters` rounds. */
  def labelPropagation(edges: DataFrame, iters: Int,
                       broadcastLabels: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // each round's label vector is node-sized and feeds the next
    // round's join — localCheckpoint every other round keeps the plan
    // flat (analysis over the nested 3-shuffle chain otherwise grows
    // superlinearly in `iters`). `broadcastLabels` is the single-box /
    // small-graph switch: with it the edge list never shuffles — at
    // cluster scale with billions of nodes leave it off and let the
    // join co-partition on dst.
    var lbl = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (i <- 1 to iters) {
      val lv = lbl.select(col("node").as("dst"), col("lbl"))
      val msgs = edges
        .join(if (broadcastLabels) broadcast(lv) else lv, Seq("dst"))
        .select(col("src").as("node"), col("lbl"))
      // argmax(count, tie -> min label) as a partial-aggregable
      // max(struct(count, -label)) — no window over the node set
      lbl = msgs.groupBy(col("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
      if (i % 2 == 0) lbl = lbl.localCheckpoint(true)
    }
    lbl.select(col("node"), col("lbl").as("community"))
  }

  /** DuckDB mirror of [[labelPropagation]]: unrolled CTE chain over
    * `edgesCte` (must yield edges(src, dst), both directions). Ends
    * with `lp$iters(node, community)` — callers append the final
    * SELECT. */
  def lpaSql(edgesCte: String, iters: Int): String = {
    val base =
      s"""WITH edges AS ($edgesCte),
         |lp0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""m$i AS (
         |  SELECT e.src AS node, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM edges e JOIN lp${i - 1} l ON e.dst = l.node
         |  GROUP BY 1, 2
         |), lp$i AS (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
         |    FROM m$i) x WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$steps,\nlp AS (SELECT node, lbl AS community FROM lp$iters)"
  }

  /** Per-node triangle participation counts — compact-forward triangle
    * enumeration (Latapy 2008) with degree-ordered orientation: every
    * undirected edge points from its lower-(degree, id) endpoint to the
    * higher one, wedges fan out only from edge sources, and the wedge
    * count is bounded by the graph's arboricity instead of its max
    * degree — the property that survives a power-law graph at scale.
    * The total order is the composite key deg·2^32 + node, so no
    * global window/sort is needed to rank nodes.
    *
    * `edges` is one row per undirected edge (p1, p2), p1 != p2, no
    * duplicates. Returns (node, triangles), one row per node in >= 1
    * triangle. */
  def trianglesPerNode(edges: DataFrame,
      broadcastClosure: Boolean = true): DataFrame =
    trianglesFromOriented(orientEdges(edges), broadcastClosure)

  /** Degree-ordered orientation of an undirected edge list — the
    * ingest-time half of [[trianglesPerNode]]: callers that iterate
    * (or re-query) should cache THIS artifact, the same pattern as
    * the ANN indexes; the enumeration half then pays only the wedge
    * joins. Output: (src, dst, dkey) with src the lower-(degree, id)
    * endpoint and dkey the composite order key of dst. */
  def orientEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(col("p1").cast("long"), col("p2").cast("long"))
    val und = e.select(col("p1").as("x"), col("p2").as("y"))
      .unionByName(e.select(col("p2").as("x"), col("p1").as("y")))
    val k = und.groupBy(col("x").as("node"))
      .agg(count(lit(1)).as("d"))
      .select(col("node"),
        (col("d") * lit(4294967296L) + col("node")).as("key"))
    e.join(k.select(col("node").as("p1"), col("key").as("k1")), Seq("p1"))
      .join(k.select(col("node").as("p2"), col("key").as("k2")), Seq("p2"))
      .select(
        when(col("k1") < col("k2"), col("p1")).otherwise(col("p2")).as("src"),
        when(col("k1") < col("k2"), col("p2")).otherwise(col("p1")).as("dst"),
        when(col("k1") < col("k2"), col("k2")).otherwise(col("k1")).as("dkey"))
  }

  /** Triangle enumeration over [[orientEdges]] output.
    *
    * The wedge stream is the BIG side (bounded by arboricity but still
    * ~degree × |E| rows); the closure probe only needs the |E|-row
    * oriented edge list. With `broadcastClosure` (default) that list
    * broadcasts, so wedges stream map-side through the probe and are
    * never shuffled — measured 20 s → ~7 s at sf0.1 (1.2M edges, ~50M
    * wedges). Set it false when |E| exceeds driver/executor memory;
    * the fallback shuffles both sides on (b, c), and the web-scale
    * path is bucketing both by (b, c) at ingest. */
  def trianglesFromOriented(oe: DataFrame,
      broadcastClosure: Boolean = true): DataFrame = {
    val closure = oe.select(col("src").as("b"), col("dst").as("c"))
    val tri = oe.select(col("src"), col("dst").as("b"), col("dkey").as("bk"))
      .join(oe.select(col("src"), col("dst").as("c"), col("dkey").as("ck")),
        Seq("src"))
      .where(col("bk") < col("ck"))
      .join(if (broadcastClosure) broadcast(closure) else closure,
        Seq("b", "c"))
      .select(col("src").as("a"), col("b"), col("c"))
    tri.select(col("a").as("node"))
      .unionByName(tri.select(col("b").as("node")))
      .unionByName(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }
}
