package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorAgg, VectorFunctions => VF}

/** Product quantization for approximate nearest-neighbor search (Jégou,
  * Douze, Schmid, "Product quantization for nearest neighbor search",
  * TPAMI 2011 — here the PQ/ADC stage that complements [[Similarity]]'s
  * coarse IVF stage).
  *
  * The 100 TB story: a float embedding column is 4·d bytes per row; PQ
  * codes are m bytes-ish (one small int per subspace) — ~32× smaller at
  * d=64, m=8. The corpus scan side of a similarity query then reads
  * only (id, codes), and scoring is m table lookups per candidate
  * instead of a d-wide dot product. Training and encoding are plain
  * joins + aggregations (hash-sample init, Lloyd via
  * [[graft.functions.VectorAvg]]); nothing leaves the DataFrame plane.
  *
  * Vectors are L2-normalized up front so inner product ≡ cosine and the
  * asymmetric-distance (ADC) scores rank like [[Similarity.bruteForceTopK]].
  */
object ProductQuantization {

  /** Unit-L2-normalized copy of a float/double vector as array<double>
    * (zero vectors pass through unscaled). */
  def normalize(vec: Column): Column = {
    val n = VF.l2Norm(vec)
    transform(vec, x => x.cast("double") / when(n === 0.0, 1.0).otherwise(n))
  }

  /** (id, s, sv): one row per (vector, subspace) with the subspace
    * slice — the single-projection explode shape (see Dedup.bands). */
  private def subspaced(df: DataFrame, m: Int, subDim: Int,
                        idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), normalize(col(vecCol)).as("nv"))
      .withColumn("ss", explode(array((0 until m).map { s =>
        struct(lit(s).as("s"), slice(col("nv"), s * subDim + 1, subDim).as("sv"))
      }: _*)))
      .select(col("id"), col("ss.s").as("s"), col("ss.sv").as("sv"))

  // codegen'd kernels — these run n·m·k times per Lloyd round; the HOF
  // aggregate(zip_with) formulation is interpreted and ~10× slower here
  private def dot(a: Column, b: Column): Column = VF.dot(a, b)

  private def sqnorm(a: Column): Column = VF.dot(a, a)

  /** Euclidean nearest-codeword assignment of every (id, s, sv) row →
    * (id, s, code): argmin ||x-c||² ≡ argmax (2·x·c − ||c||²).
    * `codebooks` must carry (s, code, cvec) and be broadcast-small
    * (m·k rows). ||c||² is precomputed once per codeword (m·k rows),
    * not per scored pair (n·m·k of them), and the per-group aggregate
    * carries only the scalar code — callers that need the subvector
    * re-join the narrow (id, s) keys against their cached input. */
  private def assign(sub: DataFrame, codebooks: DataFrame): DataFrame =
    sub.join(broadcast(
        codebooks.withColumn("cnorm2", sqnorm(col("cvec")))), Seq("s"))
      .select(col("id"), col("s"), col("code"),
        (dot(col("sv"), col("cvec")) * 2.0 - col("cnorm2")).as("score"))
      .groupBy("id", "s")
      .agg(max_by(col("code"), col("score")).as("code"))

  /** Train one k-means codebook per subspace: deterministic hash-sample
    * init (k subvectors per subspace), `lloydIters` rounds of
    * assign → per-cell mean (the Euclidean k-means update —
    * [[graft.functions.VectorAvg]] partial-aggregates, so only
    * cells×tasks rows cross each exchange). Codes are densely
    * renumbered 0..<k per subspace; empty cells drop out. */
  def trainCodebooks(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
                     lloydIters: Int = 3, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // dim is a parameter, not a corpus.first() probe: plan construction
    // must stay action-free (lazy end-to-end)
    val d = dim
    require(d % m == 0, s"dim $d must divide into $m subspaces")
    val sub = subspaced(corpus, m, d / m, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-subspace deterministic sample: k smallest id-hashes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(xxhash64(col("id")).asc, col("id").asc)
    val init = sub.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("s"), (col("rn") - 1).cast("int").as("code"),
        col("sv").as("cvec"))
    // Training is EAGER by design: each Lloyd round materializes its
    // m·k-row codebook (localCheckpoint) so round N+1 is one job over
    // the cached subvectors instead of a plan that re-executes every
    // earlier round — iterative refinement over a shared cached input,
    // the same shape as connectedComponents.
    var cb = init.localCheckpoint()
    (1 to lloydIters).foreach { _ =>
      cb = assign(sub, cb)
        .join(sub, Seq("id", "s"))
        .groupBy(col("s"), col("code"))
        .agg(VectorAgg.vectorAvg(col("sv")).as("cvec"))
        .localCheckpoint()
    }
    // dense renumber (cells can empty out during Lloyd)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(col("code"))
    val out = cb
      .withColumn("code", (row_number().over(wd) - 1).cast("int"))
      .select(col("s"), col("code"), col("cvec"))
      .localCheckpoint()
    sub.unpersist()
    out
  }

  /** Mean squared reconstruction error of the corpus under `codebooks`
    * (the k-means objective — Lloyd rounds never increase it). One row,
    * one double. */
  def quantizationError(corpus: DataFrame, codebooks: DataFrame, dim: Int,
                        m: Int, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val sub = subspaced(corpus, m, dim / m, idCol, vecCol)
    assign(sub, codebooks)
      .join(sub, Seq("id", "s"))
      .join(broadcast(codebooks), Seq("s", "code"))
      .select(aggregate(zip_with(col("sv"), col("cvec"),
        (x, c) => (x - c) * (x - c)), lit(0.0), (acc, v) => acc + v).as("se"))
      .agg(avg(col("se")).as("mse"))
  }

  /** Encode every corpus vector as m codewords: (id, codes array<int>),
    * codes[s] = nearest codeword of subspace s. */
  def encode(corpus: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val d = dim
    assign(subspaced(corpus, m, d / m, idCol, vecCol), codebooks)
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        e => e.getField("code")).as("codes"))
  }

  /** ADC top-k: score every encoded corpus vector against each query by
    * summing per-subspace inner products from a lookup table (m lookups
    * per candidate, built once per query as a dense m·k array). Returns
    * (query_id, neighbor_id, adc_score, rank). On normalized vectors
    * ADC approximates cosine, so ranks track [[Similarity.bruteForceTopK]]
    * up to quantization error. */
  def adcTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
              topK: Int, dim: Int, m: Int = 8, k: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    val d = dim
    // per (query, subspace, codeword): inner product contribution
    val luts = subspaced(queries, m, d / m, idCol, vecCol)
      .join(broadcast(codebooks), Seq("s"))
      .select(col("id").as("query_id"),
        (col("s") * k + col("code")).as("slot"),
        dot(col("sv"), col("cvec")).as("ip"))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("ip"))))
        .as("lutmap"))
      // dense m·k array (dropped cells → 0.0): positional indexing for
      // the scoring kernel
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m * k - 1)),
          i => coalesce(element_at(col("lutmap"), i), lit(0.0))).as("lut"))

    codes.select(col("id").as("neighbor_id"), col("codes"))
      .join(broadcast(luts),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorAgg.adcInnerProduct(col("codes"), col("lut"), k)
          .as("adc_score"))
      .groupBy("query_id")
      .agg(TopKAgg.topKBy(col("adc_score"), col("neighbor_id"), topK).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("rank0", "nb")))
      .select(col("query_id"), col("nb.id").as("neighbor_id"),
        col("nb.score").as("adc_score"),
        (col("rank0") + 1).cast("int").as("rank"))
  }
}
