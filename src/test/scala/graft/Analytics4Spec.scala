package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, Chunking, Drift}

/** Unit semantics for the fourth analytics pack (q114–q118). The
  * DuckDB oracle gates end-to-end parity; these pin the operator
  * semantics on crafted inputs. */
class Analytics4Spec extends SparkSpec {

  private def tokenize(word: String): Seq[String] = {
    import spark.implicits._
    val enc = Seq(word).toDF("text")
      .select(expr(Bpe.encodedExpr("text", Bpe.SparkFlavor)).as("e"))
      .head().getString(0)
    // "⟨a⟩⟨bc⟩" → Seq("a", "bc")
    enc.stripPrefix("⟨").stripSuffix("⟩").split("⟩⟨").toSeq
  }

  test("bpe: deep merge chains resolve in rank order") {
    assert(tokenize("the") == Seq("the"))
    assert(tokenize("scan") == Seq("scan"))   // a+n, s+c, sc+an
    assert(tokenize("small") == Seq("small")) // s+m, sm+a, sma+l, smal+l
    // (a,t) at rank 10 fires before (d,a) at rank 13, blocking the
    // d+a chain — real BPE rank-order behavior
    assert(tokenize("data") == Seq("d", "at", "a"))
    assert(tokenize("sort") == Seq("s", "ort"))
  }

  test("bpe: merges never cross word boundaries") {
    import spark.implicits._
    val enc = Seq("t h").toDF("text")
      .select(expr(Bpe.encodedExpr("text", Bpe.SparkFlavor)).as("e"))
      .head().getString(0)
    assert(enc == "⟨t⟩ ⟨h⟩") // no th merge across the space
  }

  test("bpe: left-to-right non-overlapping replace = leftmost-first merge") {
    import spark.implicits._
    val aa = Seq(("a", "a")) // overlap-prone merge
    val enc = Seq("aaa").toDF("text")
      .select(expr(Bpe.encodedExpr("text", Bpe.SparkFlavor, aa)).as("e"))
      .head().getString(0)
    assert(enc == "⟨aa⟩⟨a⟩") // NOT ⟨a⟩⟨aa⟩, and NOT a second-pass ⟨aaa⟩
  }

  test("chunking: boundaries, tail chunk, fingerprints") {
    import spark.implicits._
    val words = (0 until 40).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = Chunking.slidingChunks(docs, chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val exp = Seq(
      (1L, 0, 32, md5hex(words.slice(0, 32).mkString(" "))),
      (1L, 1, 16, md5hex(words.slice(24, 40).mkString(" "))),
      (2L, 0, 3, md5hex("a b c")))
    assert(got.toSeq == exp)
  }

  test("drift: identical slices have zero KL, real slices non-negative") {
    import spark.implicits._
    // two sides with the same text per lang → p == q → KL exactly 0
    val same = Seq(
      (0L, "en", "a b b c"), (1L, "en", "a b b c"),
      (2L, "de", "x y"), (3L, "de", "x y"))
      .toDF("doc_id", "lang", "text")
    val z = Drift.unigramDrift(same, col("doc_id") % 2).collect()
    assert(z.forall(r => r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0))
    // smoothed distributions are proper → Gibbs: KL ≥ 0 on real data
    val real = Drift.unigramDrift(
      graft.sources.Tables.load(spark, sfDir, "documents"),
      col("doc_id") % 2).collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(5) >= 0.0))
  }

  test("islands: streak stats match a driver-side rescan") {
    val got = SparkEntry.queries("q115_activity_islands")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // independent re-derivation: collect distinct (user, day) and scan
    val days = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    val exp = days.toSeq.sortBy(_._1).map { case (u, ds) =>
      val streaks = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (cur :: rest), d) if d == cur.head + 1 =>
          (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }.map(s => (s.last, s.size.toLong)) // (startDay, len)
      val mx = streaks.map(_._2).max
      (u, ds.size.toLong, streaks.size.toLong, mx,
        streaks.filter(_._2 == mx).map(_._1).min)
    }
    assert(got.toSeq == exp)
  }

  test("rolling z-score: flags need >=8 priors and replay exactly") {
    val flagged = SparkEntry.queries("q118_rolling_zscore")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(flagged.nonEmpty)
    // driver-side replay with exact BigDecimal moments
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("tus"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3, t._2)) // µs order key matches (ts, event_id)
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val vd = rows.map(t => BigDecimal(t._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      rows.indices.flatMap { i =>
        val frame = vd.slice(math.max(0, i - 20), i)
        val n = frame.size
        if (n < 8) None else {
          val s1 = frame.sum.toDouble
          val s2 = frame.map(x => x * x).sum.toDouble
          val variance = s2 / n - (s1 / n) * (s1 / n)
          if (variance <= 0) None else {
            val z = BigDecimal((vd(i).toDouble - s1 / n) / math.sqrt(variance))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (math.abs(z) > 3) Some((u, rows(i)._2, z)) else None
          }
        }
      }
    }
    assert(flagged.toSeq.sortBy(t => (t._1, t._2)) ==
      exp.sortBy(t => (t._1, t._2)))
  }

  test("pagerank: integer fixed-point matches hand computation on a path") {
    import spark.implicits._
    // undirected path 1-2-3: deg(1)=1, deg(2)=2, deg(3)=1
    val eo = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val edges = eo.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(eo.select(col("b").as("src"), col("a").as("dst")))
    val deg = graft.operators.GraphRank.degrees(edges)
    val got = graft.operators.GraphRank
      .fixedPointPageRank(edges, deg, iters = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // iter1: r(1)=r(3)=150000+85*(1000000 div 2) div 100 = 575000
    //        r(2)=150000+85*(1000000+1000000) div 100 = 1850000
    // iter2: r(1)=r(3)=150000+85*(1850000 div 2) div 100 = 936250
    //        r(2)=150000+85*(575000+575000) div 100 = 1127500
    assert(got == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("pagerank: result is partition-order invariant") {
    val s = spark
    val dir = sfDir
    val q = SparkEntry.queries("q122_entity_rank")
    val a = q(s, dir).collect().toSeq
    graft.sim.IndexCache.clear() // force a rebuild on fresh partitioning
    val b = q(s, dir).collect().toSeq
    assert(a == b)
  }

  test("mmr: greedy picks trade relevance against redundancy") {
    import spark.implicits._
    // b is a near-duplicate of a; c is dissimilar. MMR must pick a,
    // then c (despite b's higher rel), then b.
    val pool = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0.95),
      (2L, Array(0.999f, 0.045f, 0.0f), 0.94),
      (3L, Array(0.1f, 0.995f, 0.0f), 0.80))
      .toDF("id", "vec", "rel")
    val got = graft.sim.Similarity.mmrRerank(pool, k = 3,
        lambda = 0.7, mu = 0.3)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
  }

  test("weighted sample without replacement matches the window form") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val got = graft.text.Corpus.sampleWeightedK(
      docs, "lang", "doc_id", "n_chars", k = 15)
    // reference formulation: full sort per stratum via window
    val key = log((graft.text.Corpus.hashBucket(col("doc_id"), 1 << 30)
      .cast("double") + lit(1.0)) / lit(1073741824.0)) / col("n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(desc("key"), asc("doc_id"))
    val exp = docs.where(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), key.as("key"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 15)
      .select(col("lang"), col("doc_id"), round(col("key"), 9).as("es_key"))
    assertSameRows(got, exp)
  }

  test("triangles: degree-oriented count matches brute force on K4+pendant") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus pendant 5-1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val got = graft.operators.GraphRank
      .trianglesPerNode(edges.toDF("p1", "p2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // brute-force differential on the same graph
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val nodes = und.map(_._1).toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == brute)
  }
}
