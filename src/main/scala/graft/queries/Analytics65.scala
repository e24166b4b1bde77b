package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Sixty-fifth analytics pack (round 6, session 9): external
  * clustering validation — the true embedding labels (U) against the
  * nearest-centroid geometric assignment (V, q380's partial-
  * aggregable min(struct) construct): adjusted Rand index, V-measure
  * (homogeneity/completeness), purity/inverse-purity/F, the
  * Fowlkes-Mallows index, and the cluster-balance panel.
  *
  * Exactness discipline: the 10×10 contingency and every pair count
  * C(n,2) are exact BIGINTs (ARI and FM are one double division at
  * the end); conditional-entropy terms ride the round-9 ln grid. */
object Analytics65 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** (vec_id, u = true label, v = nearest-centroid label). */
  private def assignment(s: SparkSession, dir: String): DataFrame = {
    val cp = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")))
      .toDF("vec_id", "label", "i", "x")
      .select(col("vec_id"), col("label"), col("i").cast("long").as("i"),
        col("x").cast("double").as("x"))
      // the harness writes one row group per table: repartition after
      // the explode so the dim-join work spreads across cores
      .repartition(32, col("vec_id"))
      .localCheckpoint(true)
    val ct = cp.groupBy("label", "i")
      .agg(round(sum(round(col("x"), 6).cast(DecimalType(38, 6)))
        .cast("double") / count(lit(1)), 9).as("c"))
    cp.join(broadcast(ct.select(col("label").as("cl"), col("i"),
      col("c"))), Seq("i"))
      .groupBy(col("vec_id"), col("label").as("u"), col("cl"))
      .agg(sum(round((col("x") - col("c")) * (col("x") - col("c")), 9)
        .cast(DecimalType(38, 9))).cast("double").as("d2"))
      .groupBy("vec_id", "u")
      .agg(min(struct(col("d2"), col("cl"))).as("m"))
      .select(col("vec_id"), col("u"), col("m.cl").as("v"))
  }

  private val AssignSql =
    """comps AS MATERIALIZED (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |    CAST(u.i AS BIGINT) AS i, CAST(u.x AS DOUBLE) AS x
      |  FROM embeddings,
      |    LATERAL (SELECT UNNEST(embedding) AS x,
      |      generate_subscripts(embedding, 1) AS i) u
      |), cent AS MATERIALIZED (
      |  SELECT label AS cl, i,
      |    ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(38, 6)))
      |      AS DOUBLE) / COUNT(*), 9) AS c
      |  FROM comps GROUP BY 1, 2
      |), d2 AS MATERIALIZED (
      |  SELECT p.vec_id, p.label AS u, c.cl,
      |    CAST(SUM(CAST(ROUND((p.x - c.c) * (p.x - c.c), 9)
      |      AS DECIMAL(38, 9))) AS DOUBLE) AS d2
      |  FROM comps p JOIN cent c ON p.i = c.i
      |  GROUP BY 1, 2, 3
      |), assign AS MATERIALIZED (
      |  SELECT vec_id, u, cl AS v FROM (
      |    SELECT vec_id, u, cl,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
      |        AS rn
      |    FROM d2) z
      |  WHERE rn = 1
      |), cont AS MATERIALIZED (
      |  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS nij
      |  FROM assign GROUP BY 1, 2
      |)""".stripMargin

  /** 10×10 label-vs-assignment contingency, built ONCE per (app, dir)
    * and shared by all five clustering-validation readouts — the
    * centroid fit + nearest-centroid assignment is the expensive part
    * and is identical across q431-q435 (one artifact, five readouts). */
  private def contingency(s: SparkSession, dir: String): DataFrame =
    graft.sim.IndexCache.getOrBuild(s, s"clusteval-cont:$dir") {
      assignment(s, dir).groupBy("u", "v").agg(count(lit(1)).as("nij"))
    }

  val all: Seq[Q] = Seq(

    // ---- adjusted Rand index: pair counts C(n,2) over the
    // ---- contingency, rows, columns and total; ARI = (TP − E) /
    // ---- ((a+b)/2 − E), E = a·b/C(n,2), all exact until one
    // ---- division. -------------------------------------------------
    Q("q431_adjusted_rand",
      (s, dir) => {
        val c = contingency(s, dir)
        val sij = c.agg(sum(col("nij") * (col("nij") - 1L) / lit(2L)
          cast "long").as("tp"), sum(col("nij")).as("n"))
        val ra = c.groupBy("u").agg(sum(col("nij")).as("ni"))
          .agg(sum(col("ni") * (col("ni") - 1L) / lit(2L) cast "long")
            .as("a"))
        val cb = c.groupBy("v").agg(sum(col("nij")).as("nj"))
          .agg(sum(col("nj") * (col("nj") - 1L) / lit(2L) cast "long")
            .as("b"))
        sij.crossJoin(broadcast(ra)).crossJoin(broadcast(cb))
          .select(col("n").as("n_vecs"), col("tp").as("same_pair_mass"),
            round((col("tp").cast("double")
              - col("a").cast("double") * col("b").cast("double")
                / (col("n") * (col("n") - 1L) / lit(2L) cast "long")
                  .cast("double"))
              / ((col("a") + col("b")).cast("double") / 2.0
                - col("a").cast("double") * col("b").cast("double")
                  / (col("n") * (col("n") - 1L) / lit(2L) cast "long")
                    .cast("double")), 6).as("ari"))
      },
      Some(s"""WITH $AssignSql, sij AS (
             |  SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS tp,
             |    CAST(SUM(nij) AS BIGINT) AS n
             |  FROM cont
             |), ra AS (
             |  SELECT CAST(SUM(ni * (ni - 1) // 2) AS BIGINT) AS a
             |  FROM (SELECT u, CAST(SUM(nij) AS BIGINT) AS ni
             |        FROM cont GROUP BY 1) z
             |), cb AS (
             |  SELECT CAST(SUM(nj * (nj - 1) // 2) AS BIGINT) AS b
             |  FROM (SELECT v, CAST(SUM(nij) AS BIGINT) AS nj
             |        FROM cont GROUP BY 1) z
             |)
             |SELECT n AS n_vecs, tp AS same_pair_mass,
             |  ROUND((CAST(tp AS DOUBLE)
             |    - CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
             |      / CAST(n * (n - 1) // 2 AS DOUBLE))
             |    / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) / 2.0
             |      - CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
             |        / CAST(n * (n - 1) // 2 AS DOUBLE)), 6) AS ari
             |FROM sij CROSS JOIN ra CROSS JOIN cb""".stripMargin)),

    // ---- V-measure: homogeneity = 1 − H(U|V)/H(U), completeness =
    // ---- 1 − H(V|U)/H(V), V = 2hc/(h+c); every entropy a round-9
    // ---- gridded Σ p·ln p over exact counts. -----------------------
    Q("q432_v_measure",
      (s, dir) => {
        val c = contingency(s, dir)
        val n = c.agg(sum(col("nij")).as("n"))
        def ent(key: String, out: String): DataFrame =
          c.groupBy(key).agg(sum(col("nij")).as("nk"))
            .crossJoin(broadcast(n))
            .select(round(lit(-1.0)
              * (col("nk").cast("double") / col("n").cast("double"))
              * log(col("nk").cast("double") / col("n").cast("double")),
              9).cast(DecimalType(38, 9)).as("term"))
            .agg(sum(col("term")).cast("double").as(out))
        val huv = c
          .withColumn("nv", sum(col("nij")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("v")))
          .crossJoin(broadcast(n))
          .select(round(lit(-1.0)
            * (col("nij").cast("double") / col("n").cast("double"))
            * log(col("nij").cast("double") / col("nv").cast("double")),
            9).cast(DecimalType(38, 9)).as("term"))
          .agg(sum(col("term")).cast("double").as("huv"))
        val hvu = c
          .withColumn("nu", sum(col("nij")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("u")))
          .crossJoin(broadcast(n))
          .select(round(lit(-1.0)
            * (col("nij").cast("double") / col("n").cast("double"))
            * log(col("nij").cast("double") / col("nu").cast("double")),
            9).cast(DecimalType(38, 9)).as("term"))
          .agg(sum(col("term")).cast("double").as("hvu"))
        ent("u", "hu").crossJoin(broadcast(ent("v", "hv")))
          .crossJoin(broadcast(huv)).crossJoin(broadcast(hvu))
          .select(
            round(lit(1.0) - col("huv") / col("hu"), 6)
              .as("homogeneity"),
            round(lit(1.0) - col("hvu") / col("hv"), 6)
              .as("completeness"),
            round(lit(2.0) * (lit(1.0) - col("huv") / col("hu"))
              * (lit(1.0) - col("hvu") / col("hv"))
              / ((lit(1.0) - col("huv") / col("hu"))
                + (lit(1.0) - col("hvu") / col("hv"))), 6)
              .as("v_measure"))
      },
      Some(s"""WITH $AssignSql, n AS (
             |  SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cont
             |), hu AS (
             |  SELECT CAST(SUM(CAST(ROUND(
             |    -(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             |    AS DECIMAL(38, 9))) AS DOUBLE) AS hu
             |  FROM (SELECT u, CAST(SUM(nij) AS BIGINT) AS nk
             |        FROM cont GROUP BY 1) z CROSS JOIN n
             |), hv AS (
             |  SELECT CAST(SUM(CAST(ROUND(
             |    -(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             |    AS DECIMAL(38, 9))) AS DOUBLE) AS hv
             |  FROM (SELECT v, CAST(SUM(nij) AS BIGINT) AS nk
             |        FROM cont GROUP BY 1) z CROSS JOIN n
             |), huv AS (
             |  SELECT CAST(SUM(CAST(ROUND(
             |    -(CAST(nij AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln(CAST(nij AS DOUBLE) / CAST(nv AS DOUBLE)), 9)
             |    AS DECIMAL(38, 9))) AS DOUBLE) AS huv
             |  FROM (SELECT nij,
             |      CAST(SUM(nij) OVER (PARTITION BY v) AS BIGINT) AS nv
             |    FROM cont) z CROSS JOIN n
             |), hvu AS (
             |  SELECT CAST(SUM(CAST(ROUND(
             |    -(CAST(nij AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln(CAST(nij AS DOUBLE) / CAST(nu AS DOUBLE)), 9)
             |    AS DECIMAL(38, 9))) AS DOUBLE) AS hvu
             |  FROM (SELECT nij,
             |      CAST(SUM(nij) OVER (PARTITION BY u) AS BIGINT) AS nu
             |    FROM cont) z CROSS JOIN n
             |)
             |SELECT
             |  ROUND(1.0 - huv / hu, 6) AS homogeneity,
             |  ROUND(1.0 - hvu / hv, 6) AS completeness,
             |  ROUND(2.0 * (1.0 - huv / hu) * (1.0 - hvu / hv)
             |    / ((1.0 - huv / hu) + (1.0 - hvu / hv)), 6)
             |    AS v_measure
             |FROM hu CROSS JOIN hv CROSS JOIN huv CROSS JOIN hvu"""
        .stripMargin)),

    // ---- purity / inverse purity / their harmonic F: per-assigned-
    // ---- cluster majority mass and per-true-class majority mass,
    // ---- exact integers over the contingency. ----------------------
    Q("q433_purity",
      (s, dir) => {
        val c = contingency(s, dir)
        val n = c.agg(sum(col("nij")).as("n"))
        val p = c.groupBy("v").agg(max(col("nij")).as("mx"))
          .agg(sum(col("mx")).as("pmass"))
        val ip = c.groupBy("u").agg(max(col("nij")).as("mx"))
          .agg(sum(col("mx")).as("ipmass"))
        p.crossJoin(broadcast(ip)).crossJoin(broadcast(n))
          .select(col("n").as("n_vecs"),
            round(col("pmass").cast("double") / col("n").cast("double"),
              6).as("purity"),
            round(col("ipmass").cast("double")
              / col("n").cast("double"), 6).as("inverse_purity"),
            round(lit(2.0) * col("pmass").cast("double")
              * col("ipmass").cast("double")
              / (col("n").cast("double")
                * (col("pmass") + col("ipmass")).cast("double")), 6)
              .as("purity_f"))
      },
      Some(s"""WITH $AssignSql, n AS (
             |  SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cont
             |), p AS (
             |  SELECT CAST(SUM(mx) AS BIGINT) AS pmass
             |  FROM (SELECT v, CAST(MAX(nij) AS BIGINT) AS mx
             |        FROM cont GROUP BY 1) z
             |), ip AS (
             |  SELECT CAST(SUM(mx) AS BIGINT) AS ipmass
             |  FROM (SELECT u, CAST(MAX(nij) AS BIGINT) AS mx
             |        FROM cont GROUP BY 1) z
             |)
             |SELECT n AS n_vecs,
             |  ROUND(CAST(pmass AS DOUBLE) / CAST(n AS DOUBLE), 6)
             |    AS purity,
             |  ROUND(CAST(ipmass AS DOUBLE) / CAST(n AS DOUBLE), 6)
             |    AS inverse_purity,
             |  ROUND(2.0 * CAST(pmass AS DOUBLE) * CAST(ipmass AS DOUBLE)
             |    / (CAST(n AS DOUBLE)
             |      * CAST(pmass + ipmass AS DOUBLE)), 6) AS purity_f
             |FROM p CROSS JOIN ip CROSS JOIN n""".stripMargin)),

    // ---- Fowlkes-Mallows: FM = TP / √((TP+FP)(TP+FN)) from the same
    // ---- exact pair masses as ARI. ---------------------------------
    Q("q434_fowlkes_mallows",
      (s, dir) => {
        val c = contingency(s, dir)
        val sij = c.agg(sum(col("nij") * (col("nij") - 1L) / lit(2L)
          cast "long").as("tp"))
        val ra = c.groupBy("u").agg(sum(col("nij")).as("ni"))
          .agg(sum(col("ni") * (col("ni") - 1L) / lit(2L) cast "long")
            .as("a"))
        val cb = c.groupBy("v").agg(sum(col("nij")).as("nj"))
          .agg(sum(col("nj") * (col("nj") - 1L) / lit(2L) cast "long")
            .as("b"))
        sij.crossJoin(broadcast(ra)).crossJoin(broadcast(cb))
          .select(col("tp").as("tp_pairs"), col("a").as("true_pairs"),
            col("b").as("assigned_pairs"),
            round(col("tp").cast("double")
              / sqrt(col("a").cast("double") * col("b").cast("double")),
              6).as("fowlkes_mallows"))
      },
      Some(s"""WITH $AssignSql, sij AS (
             |  SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS tp
             |  FROM cont
             |), ra AS (
             |  SELECT CAST(SUM(ni * (ni - 1) // 2) AS BIGINT) AS a
             |  FROM (SELECT u, CAST(SUM(nij) AS BIGINT) AS ni
             |        FROM cont GROUP BY 1) z
             |), cb AS (
             |  SELECT CAST(SUM(nj * (nj - 1) // 2) AS BIGINT) AS b
             |  FROM (SELECT v, CAST(SUM(nij) AS BIGINT) AS nj
             |        FROM cont GROUP BY 1) z
             |)
             |SELECT tp AS tp_pairs, a AS true_pairs,
             |  b AS assigned_pairs,
             |  ROUND(CAST(tp AS DOUBLE)
             |    / sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 6)
             |    AS fowlkes_mallows
             |FROM sij CROSS JOIN ra CROSS JOIN cb""".stripMargin)),

    // ---- cluster-balance panel of the assignment: size entropy over
    // ---- ln k, max/min size ratio, and the uniform chi-square. -----
    Q("q435_cluster_balance",
      (s, dir) => {
        val sizes = assignment(s, dir).groupBy("v")
          .agg(count(lit(1)).as("sz"))
        val tot = sizes.agg(sum(col("sz")).as("n"),
          count(lit(1)).as("k"))
        sizes.crossJoin(broadcast(tot))
          .select(col("n"), col("k"), col("sz"),
            round(lit(-1.0)
              * (col("sz").cast("double") / col("n").cast("double"))
              * log(col("sz").cast("double") / col("n").cast("double")),
              9).cast(DecimalType(38, 9)).as("term"),
            round((col("sz").cast("double")
              - col("n").cast("double") / col("k").cast("double"))
              * (col("sz").cast("double")
                - col("n").cast("double") / col("k").cast("double"))
              / (col("n").cast("double") / col("k").cast("double")), 9)
              .cast(DecimalType(38, 9)).as("chit"))
          .groupBy("n", "k")
          .agg(sum(col("term")).cast("double").as("h"),
            sum(col("chit")).cast("double").as("chi2"),
            max(col("sz")).as("mx"), min(col("sz")).as("mn"))
          .select(col("k").as("k_clusters"),
            round(col("h") / log(col("k").cast("double")), 6)
              .as("balance_entropy"),
            round(col("mx").cast("double") / col("mn").cast("double"),
              6).as("max_min_ratio"),
            round(col("chi2"), 6).as("uniform_chi2"))
      },
      Some(s"""WITH $AssignSql, sizes AS (
             |  SELECT v, CAST(COUNT(*) AS BIGINT) AS sz
             |  FROM assign GROUP BY 1
             |), tot AS (
             |  SELECT CAST(SUM(sz) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS k
             |  FROM sizes
             |)
             |SELECT k AS k_clusters,
             |  ROUND(CAST(SUM(CAST(ROUND(
             |      -(CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
             |      * ln(CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             |      AS DECIMAL(38, 9))) AS DOUBLE)
             |    / ln(CAST(k AS DOUBLE)), 6) AS balance_entropy,
             |  ROUND(CAST(MAX(sz) AS DOUBLE) / CAST(MIN(sz) AS DOUBLE),
             |    6) AS max_min_ratio,
             |  ROUND(CAST(SUM(CAST(ROUND((CAST(sz AS DOUBLE)
             |      - CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
             |    * (CAST(sz AS DOUBLE)
             |      - CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
             |    / (CAST(n AS DOUBLE) / CAST(k AS DOUBLE)), 9)
             |    AS DECIMAL(38, 9))) AS DOUBLE), 6) AS uniform_chi2
             |FROM sizes CROSS JOIN tot
             |GROUP BY k, n""".stripMargin)),
  )
}
