package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables

/** Sixth analytics pack: brute-force differentials and soundness
  * properties for the blocking/containment/novelty/entropy operators
  * (the DuckDB oracles gate exact values; these pin the semantics the
  * oracles can't see — completeness vs naive forms, bounds). */
class Analytics6Spec extends SparkSpec {
  import spark.implicits._

  test("q136 sorted-neighborhood pairs are sound (dist re-verifies)") {
    val pairs = SparkEntry.queries("q136_sorted_neighborhood")(spark, sfDir)
    val names = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_name"))
    val reverified = pairs
      .join(names.select(col("p_partkey").as("id_a"), col("p_name").as("na")), "id_a")
      .join(names.select(col("p_partkey").as("id_b"), col("p_name").as("nb")), "id_b")
      .where(levenshtein(col("na"), col("nb")) =!= col("dist") || col("dist") > 3)
    assert(reverified.count() == 0, "emitted pair fails re-verification")
    assert(pairs.count() > 0)
    // no duplicate undirected pairs
    assert(pairs.groupBy("id_a", "id_b").count().where(col("count") > 1).count() == 0)
  }

  test("q136 finds every exact-duplicate name pair at sort distance 1") {
    // adjacent identical names are the canonical ER hit — the window
    // must never miss a run of duplicates (dist 0, neighbor offset 1)
    val pairs = SparkEntry.queries("q136_sorted_neighborhood")(spark, sfDir)
      .where(col("dist") === 0)
    val dupNames = Tables.load(spark, sfDir, "part")
      .groupBy("p_name").count().where(col("count") >= 2)
    // every duplicated name contributes at least one dist-0 pair
    val hit = Tables.load(spark, sfDir, "part")
      .join(dupNames.select("p_name"), "p_name")
      .select(col("p_partkey").as("id"))
      .join(pairs.select(col("id_a").as("id")).union(pairs.select(col("id_b").as("id"))),
        Seq("id"), "left_semi")
    // at least 2 members of every duplicate run appear in some pair
    assert(pairs.count() > 0 && hit.count() >= dupNames.count() * 2,
      s"duplicate-name coverage too low: ${hit.count()} vs ${dupNames.count()}")
  }

  test("q138 containment == brute-force all-pairs on the slice") {
    val d = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 300)
    val sh = d.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val brute = sh.select(col("id").as("id_a"), col("sh").as("sha"))
      .crossJoin(sh.select(col("id").as("id_b"), col("sh").as("shb")))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("containment",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(col("sha")).cast("double"))
      .where(col("containment") >= 0.7)
      .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
    assertSameRows(
      SparkEntry.queries("q138_containment_pairs")(spark, sfDir), brute)
  }

  test("q137 HOF entropy == explode+groupBy formulation") {
    val viaGroupBy = {
      val tk = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val cnt = tk.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val tot = tk.groupBy("doc_id").agg(count(lit(1)).cast("double").as("n"))
      cnt.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(round(-sum((col("c") / col("n")) * log(col("c") / col("n"))), 4)
          .as("entropy"))
    }
    assertSameRows(
      SparkEntry.queries("q137_lexical_entropy")(spark, sfDir)
        .select("doc_id", "entropy"),
      viaGroupBy)
  }

  test("q139 novelty: bounds hold and train docs replay as fully seen") {
    val out = SparkEntry.queries("q139_ngram_novelty")(spark, sfDir)
    val bad = out.where(col("novelty") < 0.0 || col("novelty") > 1.0 ||
      col("n_seen") > col("n_spans") || col("n_spans") <= 0)
    assert(bad.count() == 0)
    // differential: novelty == 1 - seen/spans recomputed via anti-join
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("bucket", graft.text.Corpus.hashBucket(col("doc_id"), 100))
    def spans(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 8)).as("span"))
    val train = spans(d.where(col("bucket") < 80)).select("span").distinct()
    val novel = spans(d.where(col("bucket") >= 90))
      .join(train, Seq("span"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    val joined = out.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .where(col("n_spans") - col("n_seen") =!= col("n_novel"))
    assert(joined.count() == 0, "anti-join novelty count diverges")
  }

  test("plan shapes: no cartesian products; CMS partial-aggregates before exchange") {
    import org.apache.spark.sql.execution.SimpleMode
    Seq("q136_sorted_neighborhood", "q138_containment_pairs",
        "q139_ngram_novelty").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
    val p = SparkEntry.queries("q140_cms_freq")(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    // explain prints root-first: final agg, then the exchange, then the
    // partial agg that runs below it
    val iFinal = p.indexOf("cms_sketch(")
    val iPartial = p.indexOf("partial_cms_sketch")
    assert(iFinal >= 0 && iPartial > iFinal, p.take(800))
    val iExchange = p.indexOf("Exchange", iFinal)
    assert(iExchange > iFinal && iExchange < iPartial,
      "cms_sketch should partial-aggregate below the exchange")
  }
}
