package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, Portable}
import graft.operators.SkewJoin

/** The one shuffle in the dedup family that meets a skewed key at
  * corpus scale is the banded-LSH candidate join: a viral duplicate
  * cluster (10^4+ copies of one document) drives every copy into the
  * same (band, bucket) key. Three defenses, each asserted here:
  *
  *  1. PIPELINE DISCIPLINE — exact dedup runs first (one hash shuffle)
  *     and collapses the cluster to a single representative, so the hot
  *     bucket never reaches the near-dup join. Candidate volume stays
  *     linear in distinct docs.
  *  2. AQE SKEW SPLIT — when a hot key does reach a sort-merge join,
  *     AQE's runtime skew handling splits the oversized partition
  *     (visible as `skew=true` in the final plan).
  *  3. MANUAL SALTING — SkewJoin.saltedJoin spreads a hot key over S
  *     salt values for plans AQE cannot rewrite.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def viralCorpus(copies: Int) = {
    val hot = "the viral chain letter everyone keeps reposting verbatim again"
    val background = (1 to 200).map(i =>
      (i.toLong, s"background document number $i about topic ${i % 7} " +
        s"with unique content token${i}a token${i}b token${i}c"))
    val viral = (1 to copies).map(i => (10000L + i, hot))
    (background ++ viral).toDF("doc_id", "text")
  }

  test("exact-dedup gate keeps a 10^4-copy cluster out of the LSH join") {
    val corpus = viralCorpus(copies = 10000)
    val deduped = Dedup.exactDedup(corpus)
    // the gate collapses the cluster: near-dup input is linear again
    assert(deduped.count() == 201)
    // and the banded join on the gated corpus emits bounded candidates
    // in bounded time — without the gate this self-join would produce
    // ~10^8 candidate rows from the hot bucket alone
    val pairs = Portable.minhashPairs(deduped, threshold = 0.6)
    assert(pairs.count() < 1000, "candidate volume must stay linear")
  }

  test("AQE splits the skewed banded-join partition (skew=true in plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // enough map partitions that the hot bucket is an outlier vs the
      // median (with <=2 partitions the hot one IS the median and skew
      // detection can never fire — a sibling suite may have lowered it)
      conf.set("spark.sql.shuffle.partitions", "8")
      // force a sort-merge join (a broadcast join has no skew problem)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the detection thresholds down to test-fixture bytes
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // left: banded rows of the viral corpus — one (band, chunk) key
      // holds every copy; right: a small probe set incl. one copy
      val hotDocs = viralCorpus(copies = 20000)
      def banded(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          graft.functions.PortableHashFunctions
            .simhashWords(split(col("text"), " ")).as("sw"))
        .select(col("doc_id"),
          (element_at(col("sw"), 1).bitwiseAND(255L)).as("chunk"),
          col("doc_id").as("payload"))
      val probe = hotDocs.where(col("doc_id") >= 10000L).limit(1)
        .unionByName(hotDocs.where(col("doc_id") < 10000L).limit(9))
      val left = banded(hotDocs)
      val right = banded(probe)
        .select(col("chunk"), col("doc_id").as("probe_id"))
      val joined = left.join(right, Seq("chunk"))
      // collect() drives THIS dataset's QueryExecution (count() would
      // plan a separate one whose adaptive state we can't inspect)
      val n = joined.collect().length
      assert(n > 20000, s"expected the hot key to dominate, got $n rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted join spreads a hot key over S partitions with equal results") {
    val hotFact = (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))
    val fact = hotFact.toDF("key", "payload")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "attr")
    val plain = fact.join(dim, Seq("key")).select("key", "payload", "attr")
    val salted = SkewJoin.saltedJoin(fact, dim, "key", salt = 8)
      .select("key", "payload", "attr")
    assertSameRows(plain, salted)
  }
}
