package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{Corpus, TextAnalysis}

/** Corpus-preparation operators: reproducible splits, stable stratified
  * sampling, concat-and-chunk sequence packing. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sfDir, "documents")

  test("splitAssign: deterministic, total, and roughly proportioned") {
    val d = docs.select(col("doc_id"),
      Corpus.splitAssign(col("doc_id")).as("split"))
    val counts = d.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9,
      s"train fraction off: $counts")
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
    // pure function of the id: re-evaluation is identical
    assertSameRows(d, docs.select(col("doc_id"),
      Corpus.splitAssign(col("doc_id")).as("split")))
  }

  test("hashBucket mixes: no bucket starves on sequential ids") {
    val b = spark.range(0, 10000)
      .select(Corpus.hashBucket(col("id"), 10).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b.keySet == (0L until 10L).toSet, s"missing buckets: ${b.keySet}")
    assert(b.values.min > 500 && b.values.max < 2000,
      s"sequential ids skewed the mixer: $b")
  }

  test("hashBucket is total: negative and >=2^31 ids neither throw nor skew") {
    // ANSI mode rejects Long overflow — before the pre-reduction, an id
    // near 2^32 * 2654435761 would blow up the first multiply at
    // runtime (and silently wrap under non-ANSI, diverging from the
    // DuckDB rendering)
    val ids = Seq(-1L, -2147483648L, Long.MinValue, Long.MaxValue,
      2147483648L, 1L << 40, 8589934591L)
    import spark.implicits._
    val out = ids.toDF("id")
      .select(Corpus.hashBucket(col("id"), 100).as("b"))
      .as[Long].collect()
    assert(out.forall(b => b >= 0 && b < 100), s"bucket out of range: ${out.toSeq}")
    // ids inside [0, 2^31) are unaffected by the guard (oracle parity
    // with past rounds): assert exact agreement with a local replica of
    // the published mixer
    def local(id: Long): Long = {
      val nn = java.lang.Math.floorMod(id, 2147483648L)
      val b1 = java.lang.Math.floorMod(nn * 2654435761L, 4294967296L)
      val b2 = b1 ^ (b1 >> 16)
      val b3 = java.lang.Math.floorMod(
        java.lang.Math.floorMod(b2, 2147483648L) * 2246822519L, 4294967296L)
      val b4 = b3 ^ (b3 >> 13)
      java.lang.Math.floorMod(b4, 100L)
    }
    val smallIds = Seq(0L, 1L, 42L, 123456789L, 2147483647L)
    val small = smallIds.toDF("id")
      .select(col("id"), Corpus.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    smallIds.foreach(i => assert(small(i) == local(i),
      s"mixer drifted for id=$i: spark=${small(i)} local=${local(i)}"))
  }

  test("sampleStratified: k per stratum, and a k=3 sample is a prefix of k=5") {
    val base = docs.select(col("doc_id"), col("lang"))
    val s5 = Corpus.sampleStratified(base, "doc_id", "lang", k = 5)
    val s3 = Corpus.sampleStratified(base, "doc_id", "lang", k = 3)
    val per = s5.groupBy("lang").count().collect()
    per.foreach(r => assert(r.getLong(1) <= 5, s"stratum overflow: $r"))
    assert(s5.count() > 0)
    // stability: growing k keeps every previously-sampled row
    assert(s3.exceptAll(s5).count() == 0, "k=3 sample not contained in k=5")
  }

  test("resampleToMixture: deterministic, capped at 1, shifts the mixture") {
    val weights = ((0 to 4).map(i => s"src$i" -> 3) ++
      (5 to 9).map(i => s"src$i" -> 1)).toMap
    val out = Corpus.resampleToMixture(docs, "doc_id", "source", weights, 1, 2)
    // pure function of (id, domain, counts): re-evaluation is identical
    assertSameRows(out,
      Corpus.resampleToMixture(docs, "doc_id", "source", weights, 1, 2))

    val before = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = before.values.sum
    // heavy domains (weight 3/20 of half the corpus) are capped at their
    // full size when desired >= n_d; light ones are thinned
    weights.foreach { case (d, w) =>
      val desired = w.toLong * (total / 2) / 20
      assert(after(d) <= before(d), s"$d grew")
      if (desired >= before(d))
        assert(after(d) == before(d), s"$d should keep everything")
      else {
        // hash acceptance lands near the target: allow ~4σ of the
        // equivalent binomial (tiny per-domain counts at sf0.001)
        val slack = math.max(0.35 * desired, 4 * math.sqrt(desired.toDouble))
        assert(math.abs(after(d) - desired) <= slack,
          s"$d kept ${after(d)}, wanted ~$desired ± $slack")
      }
    }
    // rows with unknown domains are dropped
    import spark.implicits._
    val stray = docs.limit(5).withColumn("source", lit("mystery"))
    assert(Corpus.resampleToMixture(docs.unionByName(stray),
      "doc_id", "source", weights, 1, 2)
      .where($"source" === "mystery").count() == 0)
  }

  test("packSequences matches a local re-pack and conserves tokens") {
    val d = docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val capacity = 512
    val packed = Corpus.packSequences(d, "doc_id", "n_tokens", capacity, "source")
      .select("source", "doc_id", "n_tokens", "cum_tokens", "seq_no")

    val rows = packed.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // differential: greedy local re-pack per source in doc_id order
    rows.groupBy(_._1).foreach { case (src, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, id, tok, gotCum, gotSeq) =>
        val start = cum
        cum += tok
        assert(gotCum == cum, s"cum mismatch at $src/$id")
        assert(gotSeq == start / capacity, s"seq mismatch at $src/$id")
      }
    }
    // conservation: packed token mass == input token mass
    val total = d.agg(sum("n_tokens")).collect().head.getLong(0)
    assert(rows.map(_._3).sum == total)
  }

  test("temperature mixture: alpha flattens the head, mass lands near target") {
    // 400 "hi" docs vs 100 "lo": at alpha=0.3 the low-resource stratum's
    // keep rate must exceed the high-resource one's
    val df = (0 until 500).map(i => (i.toLong, if (i < 400) "hi" else "lo"))
      .toDF("doc_id", "lang")
    val rates = Corpus.temperatureRates(df, "lang", alpha = 0.3, massFrac = 0.5)
      .as[(String, Double)].collect().toMap
    assert(rates("lo") > rates("hi"), rates.toString)
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
    // expected: q_hi = 400^.3/z, rate_hi = q_hi*250/400 (both < 1 here)
    val z = math.pow(400, 0.3) + math.pow(100, 0.3)
    def exp(c: Double) = math.min(1.0, math.pow(c, 0.3) / z * 250 / c)
    assert(math.abs(rates("hi") - exp(400)) < 1e-6)
    assert(math.abs(rates("lo") - exp(100)) < 1e-6)
    // the applied sample keeps ~rate of each stratum (hash is uniform)
    val kept = Corpus.sampleTemperature(df, "lang", "doc_id", 0.3, 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("hi") / 400.0 - rates("hi")) < 0.1, kept.toString)
    assert(math.abs(kept("lo") / 100.0 - rates("lo")) < 0.15, kept.toString)
  }

  test("sampleExactK: k per stratum, matches the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = Corpus.sampleExactK(docs, "lang", "doc_id", k = 7)
    // exactly k (or the stratum size, if smaller) per stratum
    val sizes = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    val strata = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    strata.foreach { case (l, n) =>
      assert(sizes(l) == math.min(7L, n), s"lang $l: ${sizes.get(l)}")
    }
    // differential: the bounded-heap agg == row_number over the hash rank
    val rank = Corpus.hashBucket($"doc_id", 1 << 30)
    val win = docs.withColumn("rank_hash", rank)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"rank_hash", $"doc_id")))
      .where($"rn" <= 7).select($"lang", $"doc_id", $"rank_hash")
    assertSameRows(got, win)
    // reproducible under arbitrary row order
    assertSameRows(got,
      Corpus.sampleExactK(docs.orderBy($"n_chars".desc), "lang", "doc_id", 7))
  }
}
