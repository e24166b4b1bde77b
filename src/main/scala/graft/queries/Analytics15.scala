package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphRank
import graft.sources.Tables

/** Fifteenth analytics pack (round 6, session 5): graph structure
  * metrics over the co-purchase graph — clustering coefficients,
  * degree assortativity, community modularity, integer-exact HITS,
  * and a bounded k-core peel. All build on the cached edge artifacts
  * (triEdgesCached / triOrientedCached / undEdgesCached), so per-query
  * cost is the metric, not graph construction. */
object Analytics15 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** q185 core threshold and peel rounds. */
  private val CoreK = 110
  private val CoreRounds = 4

  /** The q123 oracle's shared prefix: distinct co-purchase pairs and
    * the undirected degree table. */
  private[queries] val PairsCte =
    """items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), pairs AS (
      |  SELECT DISTINCT a.pk AS p1, b.pk AS p2
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |), und AS (
      |  SELECT p1 AS x, p2 AS y FROM pairs
      |  UNION ALL
      |  SELECT p2 AS x, p1 AS y FROM pairs
      |), deg AS (
      |  SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY x
      |)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- local clustering coefficient: triangles per node (from the
    // ---- cached degree-ordered orientation, q123's artifact) over
    // ---- the open wedges deg*(deg-1)/2 — the density gauge that
    // ---- separates hub-and-spoke from clique structure --------------
    Q("q181_clustering_coeff",
      (s, dir) => {
        val tri = Analytics4.triCountsCached(s, dir)
        val deg = Analytics5.undEdgesCached(s, dir)
          .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
        deg.where(col("d") >= 2)
          .join(tri, Seq("node"), "left")
          .select(col("node"), col("d"),
            coalesce(col("triangles"), lit(0L)).as("triangles"),
            round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
              (col("d") * (col("d") - 1)).cast("double"), 6).as("cc"))
          .orderBy(desc("cc"), asc("node"))
          .limit(50)
      },
      Some(s"""WITH $PairsCte, k AS (
             |  SELECT node, d * 4294967296 + node AS key FROM deg
             |), oe AS (
             |  SELECT CASE WHEN k1.key < k2.key THEN p1 ELSE p2 END AS src,
             |         CASE WHEN k1.key < k2.key THEN p2 ELSE p1 END AS dst,
             |         CASE WHEN k1.key < k2.key THEN k2.key ELSE k1.key END AS dkey
             |  FROM pairs
             |  JOIN k k1 ON pairs.p1 = k1.node
             |  JOIN k k2 ON pairs.p2 = k2.node
             |), tri AS (
             |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
             |  FROM oe e1
             |  JOIN oe e2 ON e1.src = e2.src AND e1.dkey < e2.dkey
             |  JOIN oe e3 ON e3.src = e1.dst AND e3.dst = e2.dst
             |), corners AS (
             |  SELECT a AS node FROM tri
             |  UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c FROM tri
             |), tcnt AS (
             |  SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
             |  FROM corners GROUP BY node
             |)
             |SELECT deg.node, d, COALESCE(triangles, 0) AS triangles,
             |  ROUND(2.0 * COALESCE(triangles, 0)
             |    / CAST(d * (d - 1) AS DOUBLE), 6) AS cc
             |FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
             |WHERE d >= 2
             |ORDER BY cc DESC, deg.node
             |LIMIT 50""".stripMargin)),

    // ---- degree assortativity (Newman 2002): Pearson correlation of
    // ---- endpoint degrees across edges, from INTEGER sufficient
    // ---- statistics (degrees bounded, products fit BIGINT) — only
    // ---- the final identical chain is floating point ----------------
    Q("q182_assortativity",
      (s, dir) => {
        val e = Analytics4.triEdgesCached(s, dir)
        val deg = Analytics5.undEdgesCached(s, dir)
          .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
        val ed = e
          .join(deg.select(col("node").as("p1"), col("d").as("j")), Seq("p1"))
          .join(deg.select(col("node").as("p2"), col("d").as("k")), Seq("p2"))
        val stats = ed.agg(count(lit(1)).as("m"),
          sum(col("j") + col("k")).as("s1"),
          sum(col("j") * col("j") + col("k") * col("k")).as("s2"),
          sum(col("j") * col("k")).as("s3"))
        val m = col("m").cast("double")
        val meanH = col("s1").cast("double") / (lit(2.0) * m)
        val r = (col("s3").cast("double") / m - meanH * meanH) /
          (col("s2").cast("double") / (lit(2.0) * m) - meanH * meanH)
        stats.select(col("m").as("n_edges"), round(r, 6).as("assortativity"))
      },
      Some(s"""WITH $PairsCte, ed AS (
             |  SELECT d1.d AS j, d2.d AS k
             |  FROM pairs
             |  JOIN deg d1 ON pairs.p1 = d1.node
             |  JOIN deg d2 ON pairs.p2 = d2.node
             |), stats AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
             |    CAST(SUM(j + k) AS BIGINT) AS s1,
             |    CAST(SUM(j * j + k * k) AS BIGINT) AS s2,
             |    CAST(SUM(j * k) AS BIGINT) AS s3
             |  FROM ed
             |)
             |SELECT m AS n_edges,
             |  ROUND((CAST(s3 AS DOUBLE) / CAST(m AS DOUBLE)
             |      - (CAST(s1 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
             |        * (CAST(s1 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))))
             |    / (CAST(s2 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))
             |      - (CAST(s1 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
             |        * (CAST(s1 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))), 6)
             |    AS assortativity
             |FROM stats""".stripMargin)),

    // ---- modularity of the q132 LPA communities (Newman-Girvan Q):
    // ---- per community, intra-edge fraction minus the degree-share
    // ---- squared — integer edge/degree sums from the SAME cached
    // ---- graph + label chain, so this audits q132's output ----------
    Q("q183_modularity",
      (s, dir) => {
        // labels + degrees are the cached cross-query artifacts
        // (q132/q183/q279 share them) — no per-query checkpoint needed
        val lbl = Analytics5.lpaLabelsCached(s, dir)
        val e = Analytics4.triEdgesCached(s, dir)
        val deg = Analytics5.undDegCached(s, dir)
          .select(col("node"), col("ki").as("d"))
        val m = e.agg(count(lit(1)).as("m"))
        val intra = e
          .join(lbl.select(col("node").as("p1"), col("community").as("c1")),
            Seq("p1"))
          .join(lbl.select(col("node").as("p2"), col("community").as("c2")),
            Seq("p2"))
          .where(col("c1") === col("c2"))
          .groupBy(col("c1").as("community")).agg(count(lit(1)).as("mc"))
        val dsum = lbl.join(deg, Seq("node"))
          .groupBy("community").agg(sum(col("d")).as("dc"),
            count(lit(1)).as("size"))
        dsum.join(intra, Seq("community"), "left")
          .crossJoin(broadcast(m))
          .select(col("community"), col("size"),
            coalesce(col("mc"), lit(0L)).as("intra_edges"),
            round(coalesce(col("mc"), lit(0L)).cast("double") /
                col("m").cast("double") -
              (col("dc").cast("double") / (lit(2.0) * col("m").cast("double"))) *
              (col("dc").cast("double") / (lit(2.0) * col("m").cast("double"))),
              6).as("q_c"))
          .orderBy(desc("size"), asc("community"))
          .limit(15)
      },
      Some(GraphRank.lpaSql(
        edgesCte = "SELECT x AS src, y AS dst FROM und",
        iters = 3).replace("WITH edges AS", s"WITH $PairsCte, edges AS") +
        s"""
          |, mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
          |intra AS (
          |  SELECT l1.community, CAST(COUNT(*) AS BIGINT) AS mc
          |  FROM pairs
          |  JOIN lp l1 ON pairs.p1 = l1.node
          |  JOIN lp l2 ON pairs.p2 = l2.node
          |  WHERE l1.community = l2.community
          |  GROUP BY l1.community
          |), dsum AS (
          |  SELECT community, CAST(SUM(d) AS BIGINT) AS dc,
          |    CAST(COUNT(*) AS BIGINT) AS size
          |  FROM lp JOIN deg ON lp.node = deg.node
          |  GROUP BY community
          |)
          |SELECT community, size, COALESCE(mc, 0) AS intra_edges,
          |  ROUND(CAST(COALESCE(mc, 0) AS DOUBLE) / CAST(m AS DOUBLE)
          |    - (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
          |      * (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))), 6) AS q_c
          |FROM dsum LEFT JOIN intra USING (community) CROSS JOIN mm
          |ORDER BY size DESC, community
          |LIMIT 15""".stripMargin)),

    // ---- HITS hubs/authorities (Kleinberg 1999) on the customer ->
    // ---- supplier bipartite graph — INTEGER-EXACT: two unnormalized
    // ---- iterations keep every score an integer sum (the q122
    // ---- PageRank trick without even needing micro-units), one final
    // ---- normalization by the max ------------------------------------
    Q("q184_hits_bipartite",
      (s, dir) => {
        // materialize the bipartite edge list ONCE (localCheckpoint):
        // it feeds all three iteration joins, which would otherwise
        // each re-run the orders⋈lineitem distinct. The score vectors
        // are side-sized (suppliers / customers) — broadcast them so
        // the edge list never shuffles after the checkpoint
        // loadParallel: the join + distinct otherwise run inside the
        // single-task row-group scan (guide §2.5 input skew)
        val edges = t(s, dir, "orders")
          .join(graft.sources.Tables.loadParallel(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .distinct()
          .localCheckpoint(true)
        // h0 = 1 per customer; a1(s) = indegree; h1(c) = sum a1 over
        // c's suppliers; a2(s) = sum h1 over s's customers
        val a1 = edges.groupBy("s").agg(count(lit(1)).as("a1"))
        val h1 = edges.join(broadcast(a1), Seq("s"))
          .groupBy("c").agg(sum(col("a1")).as("h1"))
        val a2 = edges.join(broadcast(h1), Seq("c"))
          .groupBy("s").agg(sum(col("h1")).as("a2"))
        val mx = a2.agg(max(col("a2")).as("mx"))
        a2.crossJoin(broadcast(mx))
          .select(col("s").as("suppkey"), col("a2").as("authority"),
            round(col("a2").cast("double") / col("mx").cast("double"), 6)
              .as("authority_norm"))
          .orderBy(desc("authority"), asc("suppkey"))
          .limit(20)
      },
      Some("""WITH edges AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |), a1 AS (
             |  SELECT s, CAST(COUNT(*) AS BIGINT) AS a1 FROM edges GROUP BY s
             |), h1 AS (
             |  SELECT c, CAST(SUM(a1) AS BIGINT) AS h1
             |  FROM edges JOIN a1 USING (s) GROUP BY c
             |), a2 AS (
             |  SELECT s, CAST(SUM(h1) AS BIGINT) AS a2
             |  FROM edges JOIN h1 USING (c) GROUP BY s
             |), mx AS (SELECT MAX(a2) AS mx FROM a2)
             |SELECT s AS suppkey, a2 AS authority,
             |  ROUND(CAST(a2 AS DOUBLE) / CAST(mx AS DOUBLE), 6)
             |    AS authority_norm
             |FROM a2 CROSS JOIN mx
             |ORDER BY authority DESC, suppkey
             |LIMIT 20""".stripMargin)),

    // ---- bounded k-core peel: repeatedly drop nodes with degree < K
    // ---- on the induced subgraph, 4 unrolled rounds — the census per
    // ---- round shows convergence toward the K-core. At cluster scale
    // ---- each round is one degree count + two semi-joins ------------
    Q("q185_kcore_peel",
      (s, dir) => {
        // iterative-driver shape (the q121 pattern): each round's edge
        // set is persisted and counted eagerly, so round r+1 reads the
        // materialized round-r graph instead of re-evaluating the whole
        // peel chain; the census scalars are metadata-sized by
        // construction (two longs per round)
        var edges = Analytics4.triEdgesCached(s, dir)
          .select(col("p1"), col("p2"))
        val rows = (1 to CoreRounds).map { r =>
          val und = edges.select(col("p1").as("x"))
            .unionByName(edges.select(col("p2").as("x")))
          // survivors are node-sized (≤ |parts|) — persist once, then
          // BROADCAST both semi-joins: the edge list never shuffles, so
          // a round costs one degree aggregation instead of three
          // exchanges. localCheckpoint (not persist) is load-bearing:
          // it truncates the logical plan, whose Catalyst analysis
          // cost otherwise grows superlinearly round over round
          // (measured: plan construction alone 1.2s by round 4)
          val survivors = und.groupBy("x").agg(count(lit(1)).as("d"))
            .where(col("d") >= CoreK).select("x").persist()
          val next = edges
            .join(broadcast(survivors.select(col("x").as("p1"))),
              Seq("p1"), "left_semi")
            .join(broadcast(survivors.select(col("x").as("p2"))),
              Seq("p2"), "left_semi")
            .localCheckpoint(false) // lazy: the census action right
          // below materializes it — eager + count was two jobs/round
          // r12 (VERDICT r11 #5): BOTH census scalars in ONE action —
          // the node and edge counts ride one UNION of two scalar
          // aggregates (no broadcast, two independent stages in one
          // job), so a round costs one census job, not two; the
          // survivors persist still fills inside that same job
          val censusRows = next.agg(count(lit(1)).as("c"))
            .select(lit(0L).as("i"), col("c"))
            .unionByName(survivors.agg(count(lit(1)).as("c"))
              .select(lit(1L).as("i"), col("c")))
            .collect().sortBy(_.getLong(0))
          val (nEdges, nNodes) =
            (censusRows(0).getLong(1), censusRows(1).getLong(1))
          survivors.unpersist()
          edges = next
          (r, nNodes, nEdges)
        }
        val spark = s
        import spark.implicits._
        rows.toDF("round", "n_nodes", "n_edges").orderBy("round")
      },
      Some {
        val rounds = (1 to CoreRounds).map { r =>
          val prev = if (r == 1) "pairs" else s"e${r - 1}"
          // MATERIALIZED is load-bearing: the rounds reference each
          // other 2-3x, and inlining re-evaluates the whole peel chain
          // combinatorially (observed: >22 GB on the sf0.1 graph)
          s"""s$r AS MATERIALIZED (
             |  SELECT x FROM (
             |    SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
             |      SELECT p1 AS x FROM $prev UNION ALL SELECT p2 FROM $prev)
             |    GROUP BY x)
             |  WHERE d >= $CoreK
             |), e$r AS MATERIALIZED (
             |  SELECT p1, p2 FROM $prev
             |  WHERE p1 IN (SELECT x FROM s$r) AND p2 IN (SELECT x FROM s$r)
             |)""".stripMargin
        }.mkString(",\n")
        val selects = (1 to CoreRounds).map { r =>
          s"""SELECT $r AS round,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s$r) AS n_nodes,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r) AS n_edges""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH $PairsCte,\n$rounds\n$selects\nORDER BY round"""
      }))
}
