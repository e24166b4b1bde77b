package graft

import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}
import org.apache.spark.sql.functions._

import graft.operators.Versioned
import graft.sources.{CdcSource, Tables}

/** Physical-plan property assertions: the scale claims in the Scaladoc
  * must be visible in `.explain`, not just asserted in prose. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  test("q02: filters and column pruning reach the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_quantity,48.0)"), p.take(500))
    // pruned read schema: projected+filter cols only, not all 11
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_shipdate") && !read.contains("l_returnflag"), read)
  }

  test("q05: dimension joins are broadcast, no cartesian") {
    val p = SparkEntry.queries("q05_nation_revenue")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("latestByKey aggregates partially before the exchange") {
    val ev = Tables.load(spark, sfDir, "events")
    val p = Versioned.latestByKey(ev, Seq("user_id"), Seq(col("ts")))
      .queryExecution.explainString(SimpleMode)
    // partial agg under the shuffle, final above it
    val iPartial = p.indexOf("partial_max_by")
    val iExchange = p.indexOf("Exchange hashpartitioning(user_id")
    val iFinal = p.indexOf("max_by")
    assert(iPartial >= 0, p.take(800))
    assert(iExchange >= 0 && iFinal >= 0)
    assert(iFinal < iExchange && iExchange < iPartial,
      "expected final-agg / exchange / partial-agg ordering (top-down plan)")
  }

  test("q42: LSH candidates come from a broadcast join; corpus never shuffles wide") {
    val p = planOf("q42_embed_lsh_topk")
    // query-side buckets broadcast; the corpus side is matched map-side
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
    // the dedup exchange carries only (query_id, neighbor_id, cosine):
    // no embedding array reaches a KEYED shuffle exchange (FormattedMode
    // lists each node's input columns and partitioning on their own
    // lines). The guarded round-robin input spread (loadParallel, r12)
    // is exempt: it exists only when the scan is narrower than the
    // cores, i.e. never at scale.
    val exchangeNodes =
      raw"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\s*\nArguments: (\w+)".r
        .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toSeq
    assert(exchangeNodes.nonEmpty, p.take(800))
    val keyed = exchangeNodes.filterNot(_._2.startsWith("RoundRobin"))
    assert(!keyed.exists(_._1.contains("_vec")),
      s"wide rows crossed a keyed exchange: ${keyed.mkString("; ").take(400)}")
  }

  test("q96: admission probe broadcasts the batch; corpus never self-joins") {
    val p = planOf("q96_embed_admission")
    // the standing corpus is scanned, bucketed in the projection, and
    // matched against broadcast batch-side buckets — a corpus self-join
    // or cartesian here would be the 100-TB killer
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q97: semantic-dedup candidates stay cell-bounded, no cartesian") {
    val p = planOf("q97_semantic_dedup")
    // within-cell pairing is an equi-join on cell over narrow (id, cell)
    // rows; the only cross-shape allowed is the broadcast 1-row/centroid
    // quantizer (BroadcastNestedLoopJoin), never a shuffle cartesian
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q101: IVFPQ probes/LUT broadcast; candidates stay cell-bounded") {
    val p = planOf("q101_embed_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q53: PQ encode/score join the broadcast codebook, never a shuffle cross") {
    val p = planOf("q53_embed_pq_topk")
    // quantizer tables travel as broadcasts (nested-loop for the cross
    // with the 256-row codebook, hash for the (m, code) LUT probe)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1200))
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q01: whole-stage codegen covers the aggregation pipeline") {
    // AQE's AdaptiveSparkPlan defers physical planning, hiding codegen
    // subtrees from a pre-execution explain — plan without it here.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
      val found = "Found (\\d+) WholeStageCodegen subtrees".r
        .findFirstMatchIn(p).map(_.group(1).toInt)
      assert(found.exists(_ >= 1), p.take(300))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q48: FastSS blocking plans as equi-joins, never a cartesian") {
    val p = planOf("q48_fuzzy_names")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "fuzzy match fell back to an all-pairs join:\n" + p.take(600))
    // candidate generation joins on the deletion-variant hash
    assert(p.contains("deletion_hashes"), p.take(400))
  }

  test("q39: IVF probes and centroids broadcast; corpus never cross-joins") {
    val p = planOf("q39_embed_ivf_topk")
    assert(p.contains("BroadcastExchange"),
      "IVF centroid/probe side not broadcast:\n" + p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("q59: heavy-hitter sketch partially aggregates before the exchange") {
    val p = SparkEntry.queries("q59_token_topk")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    // the capacity-bounded sketch must cross the shuffle, not raw tokens
    val iPartial = p.indexOf("partial_approx_top_k")
    val iExchange = p.indexOf("Exchange hashpartitioning(lang")
    assert(iPartial >= 0, "no partial sketch aggregation:\n" + p.take(800))
    assert(iExchange >= 0 && iExchange < iPartial,
      "expected exchange above the partial sketch (top-down plan)")
  }

  test("q76: sequence_count buffers partially before the exchange") {
    val p = SparkEntry.queries("q76_sequence_count")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    // only condition-matching (ts, bits) pairs cross the shuffle,
    // pre-buffered per map task — not raw events
    val iPartial = p.indexOf("partial_sequence_count")
    val iExchange = p.indexOf("Exchange hashpartitioning(user_id")
    assert(iPartial >= 0, "no partial sequence aggregation:\n" + p.take(800))
    assert(iExchange >= 0 && iExchange < iPartial,
      "expected exchange above the partial buffer (top-down plan)")
  }

  test("q77: sketch merge re-aggregates states, never re-reads raw rows") {
    val p = SparkEntry.queries("q77_sketch_merge_state")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    // ingest-side partial HLL under its exchange...
    assert(p.contains("partial_hll_sketch_agg"), p.take(800))
    // ...and the query-time merge operates on sketch states
    assert(p.contains("hll_union_agg"), p.take(800))
  }

  test("q78: incremental dedup joins on the shingle index, no cartesian") {
    val p = SparkEntry.queries("q78_incremental_dedup")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "cross-set verify must be an equi-join on shingle:\n" + p.take(800))
  }

  test("q83: the curation funnel reads the corpus exactly once") {
    val p = SparkEntry.queries("q83_curation_funnel")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1,
      s"funnel should be one scan + window + agg, saw $scans scans:\n" + p.take(800))
  }

  test("q69: decontamination broadcasts the eval index, never self-pairs") {
    val p = planOf("q69_decontamination")
    assert(p.contains("BroadcastExchange"),
      "eval shingle index not broadcast:\n" + p.take(600))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("hash kernels participate in whole-stage codegen (no fallback)") {
    // CodegenFallback expressions eject their operator from
    // WholeStageCodegen; the kernels must instead appear INSIDE a
    // generated subtree as reference-object compute() calls.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Tables.load(spark, sfDir, "documents")
        .select(graft.dedup.Dedup.simhash64(col("text")).as("sig"),
          graft.functions.HashFunctions.minhashSignature(
            graft.dedup.Dedup.shingles(col("text"))).as("mh"))
        .where(col("sig") =!= 0L)
      val p = df.queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
      val found = "Found (\\d+) WholeStageCodegen subtrees".r
        .findFirstMatchIn(p).map(_.group(1).toInt)
      assert(found.exists(_ >= 1), p.take(300))
      assert(p.contains(".compute("),
        "kernel compute() call missing from generated code")
      // and the results must round-trip identically vs interpreted eval
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("declared field projection narrows the envelope parse (ingest path)") {
    // Catalyst's JSON pruning is single-level (everything sits under
    // `payload`), so the engine prunes explicitly via decode(fields=...).
    // q61 itself now reads the landed decoded artifact (full schema,
    // Jackson paid once at ingest); the pruning contract matters on the
    // STREAMING ingest path, asserted here on decode() directly.
    // literal envelope strings so the only schema in the plan is the
    // PARSE schema (an inline synthesizer would add a full to_json)
    import spark.implicits._
    val env = graft.cdc.CdcSim.orderEnvelopes(
        graft.sources.Tables.load(spark, sfDir, "orders").limit(50))
      .select("value").as[String].collect().toSeq.toDF("value")
    // analyzed (not optimized) plan: the pruning is done by decode()
    // itself at plan construction, and a LocalRelation input would be
    // whole-plan constant-folded by the optimizer
    val p = graft.cdc.EnvelopeDecode
      .decode(env, graft.cdc.CdcSim.ordersRow, fields = Some(Seq.empty))
      .groupBy(col("_env.op").as("op")).count()
      .queryExecution.analyzed.toString
    val fromJson = p.linesIterator.find(_.contains("from_json")).getOrElse("")
    assert(fromJson.contains("op"), p.take(400))
    // the wide row fields must NOT survive into the parse schema
    assert(!fromJson.contains("customer_id") && !fromJson.contains("order_date"),
      "envelope schema not pruned:\n" + fromJson.take(600))
  }

  test("partitioned writes prune partitions at scan") {
    val out = tmpDir("graft-part")
    graft.sources.Tables.load(spark, sfDir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").mode("overwrite").parquet(out)
    val q = spark.read.parquet(out).where(col("order_year") === 1997)
      .select("o_orderkey")
    val p = q.queryExecution.explainString(FormattedMode)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("order_year"), p.take(600))
    assert(q.count() > 0)
  }

  test("q86/q87: quantile and theta sketches partially aggregate before the exchange") {
    val pq = SparkEntry.queries("q86_quantile_sketch")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    val iP = pq.indexOf("partial_dd_sketch_agg")
    val iX = pq.indexOf("Exchange hashpartitioning(l_returnflag")
    assert(iP >= 0, "no partial DDSketch aggregation:\n" + pq.take(800))
    assert(iX >= 0 && iX < iP,
      "expected exchange above the partial sketch (top-down plan)")

    val pt = SparkEntry.queries("q87_theta_overlap")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(pt.contains("partial_theta_sketch_agg"),
      "no partial theta aggregation:\n" + pt.take(800))
  }

  test("q85: bloom probe fuses into the scan-side codegen stage") {
    val p = SparkEntry.queries("q85_bloom_decontam")(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    // the probe is a Filter containing bloom_might_contain, and that
    // filter participates in whole-stage codegen (no CodegenFallback
    // stage break around it)
    val line = p.linesIterator.find(_.contains("bloom_might_contain"))
    assert(line.isDefined, "probe filter missing:\n" + p.take(1200))
    assert(!p.contains("CodegenFallback"),
      "bloom probe must not break codegen:\n" + p.take(1200))
  }

  test("q103: chunk rewrite joins on the chunk key, no cartesian") {
    val p = SparkEntry.queries("q103_chunk_dedup_rewrite")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "winner lookup must be an equi-join on chunk:\n" + p.take(800))
    // the first-occurrence winner is a partial-aggregable min
    assert(p.contains("partial_min"), p.take(800))
  }

  test("q106: SCD2 shuffles once on the key, no join at all") {
    val p = SparkEntry.queries("q106_cdc_scd2_history")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("Join"), "history needs only a window:\n" + p.take(800))
    assert(p.contains("Exchange hashpartitioning(id"), p.take(800))
  }

  test("q107: z-order layout is scan + one aggregate exchange, no join") {
    val p = SparkEntry.queries("q107_zorder_layout")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "bucket stats must pre-aggregate map-side:\n" + p.take(800))
  }

  test("q108: canonical selection has no cartesian anywhere") {
    val p = SparkEntry.queries("q108_canonical_selection")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q109: exact-k sample pre-reduces to k rows before the exchange") {
    val p = SparkEntry.queries("q109_stratified_exactk")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    val iPartial = p.indexOf("partial_top_k_by")
    val iExchange = p.indexOf("Exchange hashpartitioning(lang")
    assert(iPartial >= 0, "no partial top-k aggregation:\n" + p.take(800))
    assert(iExchange >= 0 && iExchange < iPartial,
      "expected exchange above the partial top-k (top-down plan)")
    assert(!p.contains("Window"), "the scale path must not use a window")
  }

  test("q112: interval overlap plans as an equi-join on the grid cell") {
    val p = SparkEntry.queries("q112_interval_overlap")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "interval join must meet on the cell key:\n" + p.take(800))
  }

  test("q114: BPE encode is map-only up to the per-source reduce") {
    val p = planOf("q114_bpe_encode")
    // the 24-merge fold must stay a projection — no join, no window,
    // no extra exchange beyond the final per-source hash agg + sort
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
    // map-side partial aggregation, so the source exchange carries 4
    // longs per (task, source) — not per-doc rows
    assert(p.contains("partial_sum(n_tokens_doc") &&
      p.contains("hashpartitioning(source"), p.take(800))
  }

  test("q116: drift is one term shuffle plus a broadcast totals join") {
    val p = planOf("q116_token_drift")
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
    assert(p.contains("BroadcastExchange"),
      "per-lang totals must broadcast back, not shuffle the term table")
  }

  test("q117: chunking is pure flatmap — no join, window, or hash shuffle") {
    val p = planOf("q117_chunk_windows")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning"),
      "chunking must not shuffle; output partitioning follows the input")
  }

  test("q118: rolling z-score is a single user_id window, no join") {
    val p = planOf("q118_rolling_zscore")
    assert(!p.contains("Join"), p.take(800))
    assert(p.indexOf("Exchange hashpartitioning(user_id") ==
      p.lastIndexOf("Exchange hashpartitioning(user_id"),
      "expected exactly one user_id exchange feeding the window")
  }

  test("q119: co-occurrence self-join keys on orderkey, no cartesian") {
    val p = SparkEntry.queries("q119_co_occurrence")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    // the only nested-loop join allowed is the 1-row n_orders scalar
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("Exchange hashpartitioning(ok"),
      "pair generation must meet on the order key")
  }

  test("q120: weighted sample pre-reduces to k rows before the exchange") {
    val p = SparkEntry.queries("q120_weighted_sample")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    val iPartial = p.indexOf("partial_top_k_by")
    val iExchange = p.indexOf("Exchange hashpartitioning(lang")
    assert(iPartial >= 0, "no partial top-k aggregation:\n" + p.take(800))
    assert(iExchange >= 0 && iExchange < iPartial,
      "expected exchange above the partial top-k (top-down plan)")
    assert(!p.contains("Window"), "the scale path must not use a window")
  }

  test("q121: MMR result is the driver-folded bounded pick set") {
    // the greedy steps collect one pick each over the persisted pool;
    // the RESULT plan must therefore be a bounded local relation (k
    // rows), not a re-execution of the greedy chain
    val df = SparkEntry.queries("q121_mmr_rerank")(spark, sfDir)
    val p = df.queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("LocalTableScan"),
      "picks must land as a bounded local relation:\n" + p.take(600))
    assert(df.count() <= 5, "pick set must stay <= k")
  }

  test("q122: PageRank iterations reuse the cached edge and degree tables") {
    val p = SparkEntry.queries("q122_entity_rank")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the full query ends in a checkpoint-backed RDD scan (iteration 6
    // lands on the every-3rd-round checkpoint); the cache-reuse pin
    // moves to an uncheckpointed 2-iteration prefix of the same chain
    val (edges, deg) = graft.queries.Analytics4.prGraphCached(spark, sfDir)
    val prefix = graft.operators.GraphRank
      .fixedPointPageRank(edges, deg, iters = 2, topK = 5,
        broadcastRanks = true)
      .queryExecution.explainString(SimpleMode)
    assert(prefix.contains("InMemoryTableScan"),
      "edges/degrees must come from the ingest-time cache each iteration")
  }

  test("q124: both fusion legs are bounded top-k before any window") {
    val p = SparkEntry.queries("q124_rrf_fusion")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("TakeOrderedAndProject"),
      "BM25 leg must bound to top-50 via distributed top-k:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q125: skyline never self-joins the full table") {
    val p = SparkEntry.queries("q125_pareto_skyline")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "no O(n^2) dominance join:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "the bounded frontier must broadcast back to the table")
  }

  test("q126: rule stats meet on equi-joins with a single scalar cross") {
    val p = SparkEntry.queries("q126_assoc_rules")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("Exchange hashpartitioning(ok"),
      "pair generation must meet on the order key")
  }

  test("q127: k-hop expansion is frontier equi-joins on the cached graph") {
    val p = SparkEntry.queries("q127_khop_reach")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("InMemoryTableScan"),
      "each hop must reuse the ingest-time edge cache")
  }

  test("q128: OLS is one hash aggregation with partial map-side combine") {
    val p = SparkEntry.queries("q128_group_ols")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      p.take(800))
    assert(!p.contains("Window"), "no window in the scale path")
    assert(p.contains("BroadcastHashJoin"),
      "the part dimension must broadcast")
  }

  test("q129: interpolation windows run over the dense axis, not events") {
    val p = SparkEntry.queries("q129_linear_interp")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("Generate explode(sequence"),
      "dense axis must come from sequence()+explode off the span row:\n" +
        p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q130: phrase postings filter before the position joins") {
    val p = SparkEntry.queries("q130_phrase_search")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "phrase closure must be equi-joins on (doc, pos):\n" + p.take(800))
    assert(p.contains("Generate posexplode"), p.take(800))
  }

  test("q131: rolling median is one bounded-frame window pass") {
    val p = SparkEntry.queries("q131_rolling_median")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("specifiedwindowframe(RowFrame, -6, currentrow"),
      "frame must be ROWS BETWEEN 6 PRECEDING AND CURRENT ROW:\n" +
        p.take(1200))
    assert(!p.contains("Join"), "no join belongs in this plan")
  }

  test("q132: LPA rounds reuse the cached undirected edge list") {
    val p = SparkEntry.queries("q132_lpa_communities")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("InMemoryTableScan"),
      "each round must scan the ingest-time edge cache")
    assert(!p.contains("Window"), "argmax must be max(struct), not a window")
  }

  test("q133: attribution plan is join-free") {
    val p = SparkEntry.queries("q133_attribution")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("Join"), "q133 must not join:\n" + p.take(600))
  }

  test("q135: weighted median is a selection readout — no shuffle in the result plan") {
    // r8: the crossing is computed by Select.weightedCrossings (two
    // bounded map-side-combined scan-aggs, construction-bounded driver
    // histograms — see Select scaladoc); the RETURNED plan is the
    // 3-row local readout, so any join/window/row-shuffle appearing in
    // it means the selection shape regressed back to a rank pass
    val df = SparkEntry.queries("q135_weighted_median")(spark, sfDir)
    val p = df.queryExecution.explainString(SimpleMode)
    assert(p.contains("LocalTableScan"), p.take(800))
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("FileScan"), p.take(800))
    // and the values still equal the prefix-sum formulation on the
    // same data (differential vs Ranks.withPrefixSum)
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(12,2)").as("w"))
    val oracle = graft.operators.Ranks.withPrefixSum(li, Seq(col("flag")),
        Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
        col("w"), "cw", "tw")
      .where(col("cw") >= col("tw") - col("cw"))
      .groupBy(col("flag")).agg(min(col("l_extendedprice")).as("wmedian"))
    assertSameRows(df, oracle)
  }

  test("q123: triangle wedges join on oriented sources, no cartesian") {
    val p = SparkEntry.queries("q123_triangle_count")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "wedge generation and closure must be equi-joins:\n" + p.take(800))
  }

  test("q142/q145: sliding actives and bitmap distinct never cartesian; bitmap partial-aggregates") {
    for (q <- Seq("q142_sliding_actives", "q145_bitmap_distinct")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n" + p.take(800))
    }
    // the bitmap agg must fold map-side (partial_bitmap_distinct before
    // the exchange), so only O(domain/8) bytes per task cross the wire
    val p = SparkEntry.queries("q145_bitmap_distinct")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("partial_bitmap_distinct"),
      "bitmap distinct must partially aggregate before the exchange:\n" +
        p.take(1200))
    assert(p.contains("BroadcastHashJoin"),
      "customer dim must broadcast:\n" + p.take(800))
  }

  test("q149/q156: prefix and weighted-Jaccard joins are equi-joins, no cartesian") {
    for (q <- Seq("q149_ppjoin_prefix", "q156_weighted_jaccard")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q candidates must come from the token index:\n" + p.take(800))
    }
  }

  test("q152/q155: ordered stat passes run on grouped/bounded rows, scalar joins broadcast") {
    for (q <- Seq("q152_ks_test", "q155_cusum_changepoint",
        "q158_autocorrelation")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), s"$q:\n" + p.take(800))
      // the single-partition window must consume an aggregate (distinct
      // values / month grid), never the raw row stream
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
        s"$q must reduce before the ordered pass:\n" + p.take(800))
    }
  }

  test("q171/q172/q175: basket and co-occurrence joins stay equi-join only") {
    for (q <- Seq("q171_apriori_triples", "q172_supplier_similarity",
        "q175_lang_vocab_overlap")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q candidates must come from the basket/posting index:\n" + p.take(800))
    }
  }

  test("q181/q183: graph metrics probe cached artifacts, equi-joins only") {
    for (q <- Seq("q181_clustering_coeff", "q183_modularity")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      // BroadcastNestedLoopJoin is permitted ONLY as the 1-row scalar
      // broadcast (the q119 idiom); a cartesian over data is not
      assert(!p.contains("CartesianProduct"), s"$q:\n" + p.take(800))
      assert(p.contains("InMemoryTableScan"),
        s"$q must consume the cached edge/triangle artifacts:\n" + p.take(600))
    }
  }

  test("topic routing contract (S1/S2 naming)") {
    assert(CdcSource.topicFor("poc", "public", "products") == "poc.public.products")
    assert(CdcSource.parseTopic("poc.public.products")
      .contains(CdcSource.TopicRef("poc", "public", "products")))
    assert(CdcSource.parseTopic("my.prefix.public.orders")
      .contains(CdcSource.TopicRef("my.prefix", "public", "orders")))
    assert(CdcSource.parseTopic("bare").isEmpty)
    val pat = CdcSource.subscribePattern("high_volume_poc",
      Seq("public.transaction_details"))
    assert("high_volume_poc.public.transaction_details".matches(pat))
    assert(!"other.public.transaction_details".matches(pat))
    val all = CdcSource.subscribePattern("poc")
    assert("poc.public.anything".matches(all) && !"pocx.public.t".matches(all))
  }

  // ---- r11 vocab-grain conversion pins: these queries were rebuilt to
  // ---- avoid single-task sorts over the (data-scaled, Heaps'-law)
  // ---- vocabulary; the shapes below are the conversion's whole point
  // ---- and a threshold/optimizer drift could silently undo them
  // ---- without tripping WindowAuditSpec (which watches Window nodes,
  // ---- not Sort+GlobalLimit). ------------------------------------------

  test("q304: vocab head is a bounded TakeOrderedAndProject, never a " +
      "global vocabulary sort") {
    val p = SparkEntry.queries("q304_term_burstiness")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("TakeOrderedAndProject"),
      "top-W census cut must plan as a per-partition bounded heap:\n" +
        p.take(800))
    assert(!p.contains("Sort ["),
      "no Sort node may appear — the limit+orderBy must fold into " +
        "TakeOrderedAndProject:\n" + p.take(800))
    assert(!p.contains("Window"), "no window belongs in this plan")
  }

  test("q430: Zipf head mass is ONE bounded top_k_by aggregation, " +
      "no vocabulary sort or window") {
    val p = SparkEntry.queries("q430_token_mass_concentration")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    // exactly one partial/final top_k_by pair: every partition reduces
    // to a k=1000 heap BEFORE the single-partition exchange
    assert(raw"partial_top_k_by\(".r.findAllIn(p).size == 1 &&
      raw"(?<!partial_)top_k_by\(".r.findAllIn(p).size == 1,
      "head cut must be one partial+final top_k_by aggregation:\n" +
        p.take(1200))
    assert(!p.contains("Sort [") && !p.contains("Window"),
      "no sort or window may touch the full vocabulary:\n" + p.take(800))
  }

  test("q136: neighborhood pairing is rank equi-joins over prefix " +
      "offsets, no window over base grain") {
    val p = SparkEntry.queries("q136_sorted_neighborhood")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("Window"),
      "the lead()-window form would single-task-sort each 1-char " +
        "block at scale:\n" + p.take(800))
    assert(p.contains("prefix_offsets("),
      "global rank must come from the bounded-state offsets aggregate:\n" +
        p.take(800))
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      "offsets and neighbor lookups must meet on broadcast equi-joins:\n" +
        p.take(800))
  }

  test("q89: the trigram-type probe never broadcasts the doc-grain side") {
    // r12: post-aggregation size estimates let the planner broadcast the
    // (doc, trigram)-grain aggregate (BuildLeft) — a multi-MB
    // single-threaded build locally and a scale bug at 100 TB. The probe
    // must be a shuffled hash join with the type table as build side.
    val p = SparkEntry.queries("q89_lm_trigram")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("ShuffledHashJoin"),
      "type probe must be a shuffled hash join:\n" + p.take(1200))
    assert(!p.contains("BroadcastHashJoin Inner BuildLeft"),
      "the doc-grain aggregate must never be a broadcast build side:\n" +
        p.take(1200))
  }

  test("q427: shingles come from ONE exploded token stream, not a " +
      "positional self-join") {
    // r12: lead(1)/lead(2) over the per-doc position order replaces the
    // triple self-join that shuffled the exploded stream three times.
    val p = SparkEntry.queries("q427_shingle_saturation")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    assert(raw"Generate posexplode".r.findAllIn(p).size == 1,
      "exactly one token explode (self-join branches re-ran it):\n" +
        p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "no positional self-join of the token stream:\n" + p.take(1200))
  }
}
