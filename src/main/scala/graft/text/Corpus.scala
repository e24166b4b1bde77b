package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline needs on top of
  * scoring/dedup: reproducible splits, stratified sampling, and
  * sequence packing. All three are deliberately expressed in arithmetic
  * every SQL engine evaluates identically, so the very same assignment
  * is recomputable downstream (in the trainer, in DuckDB, in a
  * different cluster) without shipping an assignment table.
  *
  * Scale notes: [[hashBucket]] is a narrow per-row projection (no
  * shuffle); [[splitAssign]]/[[sampleStratified]] ride on it.
  * [[packSequences]] shuffles once on the stratum key and runs one
  * window scan per stratum — pack per source/shard (as real pipelines
  * do) rather than globally, so no single ordering bottlenecks the job.
  */
object Corpus {

  /** Deterministic bucket in [0, buckets) from a non-negative id —
    * a multiplicative xor-shift mixer (Knuth/murmur-finalizer shaped,
    * public-domain constants) built only from `*`, `%`, `^`, `>>` so
    * DuckDB/Postgres/Spark all reproduce it bit-for-bit. Every multiply
    * is bounded by pre-reducing its operand mod 2^31 / 2^32, so no
    * input — negative or ≥ 2^31 — can overflow BIGNT (Spark's ANSI mode
    * rejects Long wraparound; non-ANSI would silently wrap and diverge
    * from the SQL rendering). Ids in [0, 2^31) map injectively into the
    * pre-reduction; larger/negative ids fold mod 2^31 first, which is
    * still a deterministic, well-mixed assignment.
    */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val nn = pmod(id.cast("long"), lit(2147483648L))
    val b1 = pmod(nn * lit(2654435761L), lit(4294967296L))
    val b2 = b1.bitwiseXOR(shiftright(b1, 16))
    val b3 = pmod(pmod(b2, lit(2147483648L)) * lit(2246822519L), lit(4294967296L))
    val b4 = b3.bitwiseXOR(shiftright(b3, 13))
    pmod(b4, lit(buckets.toLong))
  }

  /** The same mixer as DuckDB SQL text, kept adjacent so the two can't
    * drift (oracle parity for the split/sample queries). */
  def hashBucketSql(id: String, buckets: Int): String = {
    // pmod rendering: DuckDB/Postgres % keeps the dividend's sign
    val nn = s"((($id % 2147483648) + 2147483648) % 2147483648)"
    val b1 = s"(($nn * 2654435761) % 4294967296)"
    val b2 = s"xor($b1, $b1 >> 16)"
    val b3 = s"((($b2 % 2147483648) * 2246822519) % 4294967296)"
    val b4 = s"xor($b3, $b3 >> 13)"
    s"($b4 % $buckets)"
  }

  /** Reproducible train/val/test assignment by id hash: the split a
    * document lands in never changes as the corpus grows (unlike
    * `randomSplit`, which reassigns on every re-run and leaks val into
    * train across pipeline versions). */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split ($trainPct/$valPct)")
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic k-per-stratum sample: rank ids inside each stratum by
    * their hash bucket (id as tiebreak) and keep the first k. One
    * shuffle on the stratum key; resampling with a different k keeps
    * every previously-sampled row (the order is stable), which is what
    * makes grow-the-eval-set workflows reproducible.
    *
    * Preconditions (enforced / documented):
    *  - `idCol` MUST be an integral column (byte/short/int/long) — the
    *    bounded heap carries bigint ids and the join-back compares the
    *    id as a long. A string/decimal id would cast to null (empty
    *    sample) or collide; `require` fails loudly instead.
    *  - `(stratumCol, idCol)` should be unique and non-null: rows with
    *    a NULL stratum or id never match the winner semi-join (they are
    *    dropped, where a window form would have ranked them), and
    *    duplicate (stratum, id) rows all survive if their id wins. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
                       k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require({
        import org.apache.spark.sql.types._
        df.schema(idCol).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
      },
      s"sampleStratified: id column '$idCol' must be integral " +
        s"(byte/short/int/long), got ${df.schema(idCol).dataType.sql} — " +
        "a non-integral id would cast to NULL and silently empty the sample")
    // bounded top-k heap per stratum, not a partitionBy(stratum) rank
    // window: strata are often few (langs, sources), and the window
    // form lays each stratum's whole corpus into one task. The heap
    // orders (score desc, id asc); score = −bucket is exact in a
    // double (bucket < 2^20), so the kept set is bit-identical to
    // ROW_NUMBER() OVER (ORDER BY bucket, id) ≤ k. `idCol` must be
    // integral (the heap carries bigint ids).
    val winners = df.groupBy(col(stratumCol))
      .agg(graft.functions.TopKAgg.topKBy(
        -hashBucket(col(idCol), 1 << 20).cast("double"),
        col(idCol), k).as("__tk"))
      .select(col(stratumCol).as("__ws"), explode(col("__tk")).as("__t"))
      .select(col("__ws"), col("__t.id").as("__wid"))
    // winners is k·|strata| rows — metadata-sized next to the corpus;
    // AQE broadcasts it when small
    df.join(winners, df(stratumCol) === col("__ws") &&
        df(idCol).cast("long") === col("__wid"), "leftsemi")
  }

  /** Deterministic resampling to a target domain mixture: keep each row
    * iff its id-hash falls under its domain's acceptance rate, where
    * rate_d = min(1, desired_d / n_d) and desired_d = w_d/Σw of the
    * target total (`targetNum/targetDen` of the corpus). The common
    * training-data operation behind "reweight web:books:code to
    * 5:3:2" — undersampled domains keep everything (natural cap at 1),
    * oversized ones thin deterministically.
    *
    * The acceptance test is pure integer arithmetic
    * (`bucket · Σw · n_d < w_d · T · 10^6`, all BIGINT-bounded for
    * corpora ≤ ~10^10 rows and Σw ≤ ~100), so any engine reproduces
    * the exact row set — no floating-point rate, no boundary drift.
    * Scale shape: one groupBy over the domain column (tiny result),
    * broadcast back; no global shuffle of the data itself. Rows whose
    * domain is absent from `weights` are dropped (weight 0). */
  def resampleToMixture(df: DataFrame, idCol: String, domainCol: String,
                        weights: Map[String, Int],
                        targetNum: Int, targetDen: Int): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(targetNum > 0 && targetDen >= targetNum,
      s"target fraction must be in (0, 1]: $targetNum/$targetDen")
    val wSum = weights.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF(domainCol, "__w"))
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum(col("__n")).as("__total"))
    val rates = broadcast(
      counts.join(wdf, domainCol).crossJoin(total)
        .select(col(domainCol), col("__w"), col("__n"),
          expr(s"__total * $targetNum div $targetDen").as("__t")))
    df.join(rates, domainCol)
      .where(hashBucket(col(idCol), 1000000) * lit(wSum.toLong) * col("__n") <
        col("__w").cast("long") * col("__t") * lit(1000000L))
      .drop("__w", "__n", "__t")
  }

  /** The acceptance predicate as DuckDB SQL (oracle parity), against a
    * `c(domain, n)` counts CTE, a `w(domain, wt)` weights CTE and a
    * `tot(total)` scalar CTE joined in scope. */
  def resampleSql(id: String, wSum: Int, targetNum: Int, targetDen: Int): String =
    s"${hashBucketSql(id, 1000000)} * ($wSum * c.n) < w.wt * ((tot.total * $targetNum) // $targetDen) * 1000000"

  /** Concat-and-chunk sequence packing: within each stratum (source /
    * shard), documents are laid out in `idCol` order and cut into
    * training sequences of ~`capacity` tokens — a document starts in
    * the sequence its cumulative start-offset falls into. Returns the
    * input plus (seq_no, cum_tokens).
    *
    * Scale shape: the running offset is a [[graft.operators.Ranks]]
    * prefix-sum (range-partitioned on (stratum, id)), NOT a
    * `partitionBy(stratum)` window — strata are often few (a handful
    * of sources), and a per-stratum window would lay the whole corpus
    * of each stratum into one task. `idCol` must be unique within a
    * stratum (the layout order must be total).
    *
    * Preconditions (the prefix-sum join-back contract, surfaced here
    * because this is the public entry point, not just in Ranks):
    * `stratumCol` must be NON-NULL — rows with a NULL stratum are
    * silently dropped by the offsets equi-join (a window form would
    * have grouped them); `(stratumCol, idCol)` must be unique or the
    * layout order is not total and seq_no assignment is undefined. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    capacity: Int, stratumCol: String): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    graft.operators.Ranks.withPrefixSum(df, Seq(col(stratumCol)),
        Seq(col(idCol)), col(tokenCol), "cum_tokens", "_pack_tw")
      .drop("_pack_tw")
      .withColumn("seq_no",
        floor((col("cum_tokens") - col(tokenCol)) / lit(capacity.toLong))
          .cast("long"))
  }

  /** Per-stratum keep rates for a temperature-balanced mixture (the
    * T5/mT5 alpha-sampling scheme — Raffel et al. 2020 §3.3.1, Xue et
    * al. 2021 §3.1): target share of stratum `l` is
    * `c_l^alpha / Σ c^alpha`, flattening the head so low-resource
    * strata survive; `massFrac` sets the total kept mass. Output:
    * `(stratumCol, rate)` with `rate` rounded to 6 decimals (the
    * portability grain for the acceptance test).
    *
    * Scale shape: two aggregates over stratum counts (a stratum-bounded
    * table); the rates are a broadcast scalar table. */
  def temperatureRates(df: DataFrame, stratumCol: String,
                       alpha: Double = 0.3,
                       massFrac: Double = 0.5): DataFrame = {
    val byS = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("c"))
    val z = byS.agg(sum(pow(col("c"), alpha)).as("z"),
      sum(col("c")).as("n_total"))
    byS.crossJoin(broadcast(z))
      .withColumn("rate", round(
        least(lit(1.0),
          (pow(col("c"), alpha) / col("z")) * (col("n_total") * massFrac)
            / col("c")), 6))
      .select(col(stratumCol), col("rate"))
  }

  /** Apply [[temperatureRates]]: keep each row iff its [[hashBucket]]
    * acceptance draw clears the stratum's rate — deterministic,
    * order-independent, one narrow pass over the corpus with the rate
    * table broadcast. Keeps all input columns plus `rate`. */
  def sampleTemperature(df: DataFrame, stratumCol: String, idCol: String,
                        alpha: Double = 0.3,
                        massFrac: Double = 0.5): DataFrame =
    df.join(broadcast(temperatureRates(df, stratumCol, alpha, massFrac)),
        Seq(stratumCol))
      .where(hashBucket(col(idCol), 1000000).cast("double")
        < col("rate") * 1e6)

  /** Deterministic EXACT-k sample per stratum — the fixed-size partner
    * of [[sampleStratified]] (which keeps a fraction): each stratum
    * keeps the k rows with the smallest [[hashBucket]] rank, so the
    * pick is uniform-ish, reproducible anywhere the mixer runs, and
    * independent of row order.
    *
    * Scale shape: the bounded-heap [[graft.functions.TopKAgg.topKBy]]
    * aggregate reduces every partition to k rows per stratum BEFORE the
    * shuffle — per-stratum cost is O(k), never a full sort, and a giant
    * stratum cannot skew a window partition (there is no window).
    * Output: (stratum, id, rank_hash) rows, k per stratum. */
  def sampleExactK(df: DataFrame, stratumCol: String, idCol: String,
                   k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // negate: topKBy keeps the LARGEST scores; rank is smallest-first.
    // hashBucket < 2^30 so the double round-trip is exact.
    val rank = hashBucket(col(idCol), 1 << 30)
    df.groupBy(col(stratumCol))
      .agg(graft.functions.TopKAgg.topKBy(-rank.cast("double"),
        col(idCol).cast("long"), k).as("picks"))
      .select(col(stratumCol), explode(col("picks")).as("p"))
      .select(col(stratumCol), col("p.id").as(idCol),
        (-col("p.score")).cast("long").as("rank_hash"))
  }

  /** Weighted sampling WITHOUT replacement, exact k per stratum —
    * Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    * reservoir"): each row draws key = ln(u) / w for a uniform
    * u ∈ (0, 1] and the k largest keys win; inclusion probability is
    * proportional to weight, and the choice is one bounded-heap pass
    * (no global sort). u comes from the portable [[hashBucket]] mixer,
    * so the draw is reproducible and a SQL oracle replays it exactly.
    *
    * Output: (stratum, id, es_key) rows, k per stratum, where es_key
    * is the selection key rounded to 9 decimals. */
  def sampleWeightedK(df: DataFrame, stratumCol: String, idCol: String,
                      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (hashBucket(col(idCol), 1 << 30).cast("double") + lit(1.0)) /
      lit(1073741824.0)
    val key = log(u) / col(weightCol)
    df.where(col(weightCol) > 0)
      .groupBy(col(stratumCol))
      .agg(graft.functions.TopKAgg.topKBy(key, col(idCol).cast("long"), k)
        .as("picks"))
      .select(col(stratumCol), explode(col("picks")).as("p"))
      .select(col(stratumCol), col("p.id").as(idCol),
        round(col("p.score"), 9).as("es_key"))
  }

  /** DuckDB mirror of [[sampleWeightedK]]'s selection key. */
  def weightedKeySql(id: String, weight: String): String =
    s"(ln((CAST(${hashBucketSql(id, 1 << 30)} AS DOUBLE) + 1.0) / 1073741824.0) / $weight)"
}
