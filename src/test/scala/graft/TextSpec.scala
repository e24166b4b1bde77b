package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{FakeDecoder, Multimodal}
import graft.sources.Tables
import graft.text.TextAnalysis

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token counts and BPE-ish counts behave") {
    val df = Seq("one two three", "hello, world! 42 x").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.bpeishTokenCount($"text").as("b"))
      .as[(Int, Int)].collect()
    assert(got(0) == ((3, 3)))
    // hello , world ! 42 x → 6 BPE-ish pieces, 4 whitespace tokens
    assert(got(1) == ((4, 6)))
  }

  test("langId is deterministic, in-domain, and right on clear-cut text") {
    val docs = Tables.load(spark, sfDir, "documents")
    val preds = docs.select(TextAnalysis.langId($"text").as("p"))
      .distinct().as[String].collect().toSet
    assert(preds.subsetOf(Set("en", "es", "fr", "de", "zh", "und")))

    val clear = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("el gato es un animal y la casa es grande", "es"),
      ("der Hund ist ein Tier und die Katze auch", "de"),
      ("的 了 和 是 在 我 有 他", "zh")).toDF("text", "want")
    val wrong = clear.where(TextAnalysis.langId($"text") =!= $"want").count()
    assert(wrong == 0)
  }

  test("fingerprint is whitespace/case-normalized; rolling fp survives suffix edits") {
    val df = Seq(
      ("a", "The quick  brown fox"),
      ("b", "the quick brown fox"),
      ("c", "the quick brown fox and one tiny suffix change"))
      .toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(String, Long)].collect().toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("quality score ranks clean text above junk") {
    val df = Seq(
      ("clean", "the cat sat on the mat and it was a good day for all of us"),
      ("junk", "@@@@ #### !!!! $$$$ %%%% ^^^^ &&&& **** (((( ))))"))
      .toDF("id", "text")
    val m = df.select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(m("clean") > m("junk"))
  }

  test("punctuation alone ranks a junk doc below a clean one") {
    // identical token counts, stopword hits and length bands; ONLY the
    // symbol mass differs — catches a sign flip in the punctuation term
    val df = Seq(
      ("clean", "the cat sat on the mat and it was fine"),
      ("noisy", "the $$$cat$$$ sat on the ###mat### and it was fine!!!"))
      .toDF("id", "text")
    val m = df.select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(m("clean") > m("noisy"))
    val pc = df.select($"id", TextAnalysis.punctCount($"text").as("p"))
      .as[(String, Int)].collect().toMap
    assert(pc("clean") == 0)
    assert(pc("noisy") == 15)
  }

  test("capitalization is not symbol noise") {
    val df = Seq(
      ("lower", "the cat sat on the mat and it was fine"),
      ("caps", "The Cat Sat On The Mat And It Was Fine"))
      .toDF("id", "text")
    val pc = df.select($"id", TextAnalysis.punctCount($"text").as("p"))
      .as[(String, Int)].collect().toMap
    assert(pc("caps") == 0, s"uppercase chars counted as symbols: ${pc("caps")}")
    assert(pc("lower") == pc("caps"))
  }

  test("LM cross-entropy: in-distribution text scores below junk; unseen smoothed") {
    import graft.text.LanguageModel
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat ran to the dog")).toDF("doc_id", "text")
    val probe = Seq(
      (10L, "the cat sat on the mat"),        // seen verbatim
      (11L, "zz qq xx vv bb nn"),             // all bigrams unseen
      (12L, "x")).toDF("doc_id", "text")      // too short: no bigrams
    val got = LanguageModel.crossEntropy(ref, probe)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("cross_entropy"))).toMap
    assert(!got.contains(12L), "bigram-less doc must be absent")
    assert(got(10L)._1 == 5 && got(11L)._1 == 5)
    assert(got(10L)._2 < got(11L)._2,
      s"in-distribution ${got(10L)._2} must beat junk ${got(11L)._2}")
    // unseen bigrams get the fully-smoothed probability ln(vsz), not a
    // dropped term: all-unseen cross-entropy == ln(0 + vsz / 1) == ln(vsz)
    val vsz = ref.select(explode(split($"text", " ")).as("u"))
      .select("u").distinct().count()
    assert(math.abs(got(11L)._2 - math.log(vsz.toDouble)) < 1e-3,
      s"expected ~ln($vsz), got ${got(11L)._2} (output rounded to 4dp)")
  }

  test("trigram LM: separates junk; sparse context falls back to lower orders") {
    import graft.text.LanguageModel
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat ran to the dog")).toDF("doc_id", "text")
    val probe = Seq(
      (10L, "the cat sat on the mat"),     // seen verbatim
      (11L, "zz qq xx vv bb nn"),          // everything unseen
      // recombined: most trigrams unseen ("the rug ran", "rug ran to",
      // "to the mat") but their bigram/unigram parts are mostly in the
      // reference — the interpolated lower orders must keep this
      // between verbatim and junk
      (12L, "the rug ran to the mat"),
      (13L, "x y")).toDF("doc_id", "text") // < 3 tokens: no trigrams
    val got = LanguageModel.crossEntropyTrigram(ref, probe)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("cross_entropy"))).toMap
    assert(!got.contains(13L), "trigram-less doc must be absent")
    assert(got(10L)._1 == 4 && got(11L)._1 == 4 && got(12L)._1 == 4)
    assert(got(10L)._2 < got(12L)._2,
      "verbatim text must beat the recombined one")
    assert(got(12L)._2 < got(11L)._2,
      s"bigram-backed text ${got(12L)._2} must beat junk ${got(11L)._2}")
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      LanguageModel.crossEntropyTrigram(ref, probe, l3 = 0.9, l2 = 0.3, l1 = 0.1)
    }
  }

  test("trigram self-score fast path equals the general scorer") {
    import graft.text.LanguageModel
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat ran to the dog"),
      (4L, "x y"), // < 3 tokens: absent from both outputs
      (5L, "the cat sat on the mat the cat sat")) // repeated trigrams
      .toDF("doc_id", "text")
    val (uni, totals, big, tri) = LanguageModel.trainTrigram(corpus)
    val general = LanguageModel
      .scoreTrigram(uni, totals, big, tri, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val self = LanguageModel.scoreTrigramSelf(
      LanguageModel.trigramTypeScores(uni, totals, big, tri), corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(self == general,
      s"self-score path diverged:\n  self=$self\n  general=$general")
  }

  test("Kneser-Ney LM: separates junk; continuation counts beat raw frequency") {
    import graft.text.LanguageModel
    // "san" appears often but ONLY after "the" — raw frequency is high,
    // continuation count (distinct left contexts) is 1. "cat" appears
    // less often but after varied contexts. KN's continuation
    // distribution must prefer "cat" as a novel-context continuation.
    val ref = Seq(
      (1L, "the san the san the san the san"),
      (2L, "a cat big cat my cat"),
      (3L, "the cat sat on a mat")).toDF("doc_id", "text")
    val (big, ctx, n1pr, consts) = LanguageModel.trainKneserNey(ref)
    val probe = Seq(
      (10L, "the cat sat on a mat"), // in-distribution
      (11L, "zz qq xx vv bb nn"),    // junk: unseen everything
      (12L, "x")).toDF("doc_id", "text")
    val got = LanguageModel
      .scoreKneserNey(big, ctx, n1pr, consts, probe)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("cross_entropy"))).toMap
    assert(!got.contains(12L), "bigram-less doc must be absent")
    assert(got(10L)._2 < got(11L)._2,
      s"in-distribution ${got(10L)._2} must beat junk ${got(11L)._2}")
    // continuation principle: P_cont ranks "cat" (3 left contexts)
    // above "san" (1 left context, higher raw frequency)
    val npr = n1pr.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(npr("cat") > npr("san"),
      s"continuation counts: cat=${npr("cat")} san=${npr("san")}")
  }

  test("multimodal resize fits bounds, frame sampling emits per-frame rows") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    val media = Multimodal.synthesize(docs)
    val images = media.where($"kind" === "image")
    val resized = Multimodal.resize(images, FakeDecoder, 128, 128).toDF()
    assert(resized.where($"width" > 128 || $"height" > 128).count() == 0)
    assert(resized.count() == images.count())

    val videos = media.where($"kind" === "video")
    val frames = Multimodal.frameSample(videos, FakeDecoder, n = 4).toDF()
    assert(frames.count() > videos.count())  // >1 frame per video on average
    val perVideo = frames.groupBy("media_id").count()
    assert(perVideo.where($"count" > 4).count() == 0)
  }

  test("multimodal decode plumbing: deterministic fake, stable schema") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val media = Multimodal.synthesize(docs)
    val out = Multimodal.decodeAll(media, FakeDecoder, featureDim = 8).toDF()
    assert(out.count() == 50)
    // byte accounting matches the source text lengths
    val mismatch = out.join(docs, out("media_id") === docs("doc_id"))
      .where(col("n_bytes") =!= length(col("text"))).count()
    assert(mismatch == 0)
    // deterministic: run twice, same rows
    val out2 = Multimodal.decodeAll(media, FakeDecoder, featureDim = 8).toDF()
    assertSameRows(out.select("media_id", "meta.width", "meta.nFrames"),
      out2.select("media_id", "meta.width", "meta.nFrames"))
    // image rows have dims, audio rows have sample rate
    assert(out.where($"kind" === "image" && $"meta.width" < 64).count() == 0)
    assert(out.where($"kind" === "audio" && $"meta.sampleRate" < 8000).count() == 0)
  }

  test("vocab coverage: hand-computed Zipf curve") {
    import graft.text.TextAnalysis
    // counts: a=90, b=5, c=4, d=1 (total 100) -> cum 90, 95, 99, 100
    val text = (Seq.fill(90)("a") ++ Seq.fill(5)("b") ++
      Seq.fill(4)("c") ++ Seq("d")).mkString(" ")
    val got = TextAnalysis.vocabCoverage(Seq((1L, text)).toDF("doc_id", "text"))
      .select($"vocab_total", $"total_tokens", $"vocab_90", $"vocab_95", $"vocab_99")
      .as[(Int, Long, Int, Int, Int)].head()
    assert(got == ((4, 100L, 1, 2, 3)), got.toString)
  }

  test("bpe pair stats: frequency-weighted counts, deterministic tie-break") {
    import graft.text.TextAnalysis
    // words: ab x3, ac x1 -> pairs (a,b)=3, (b,</w>)=3, (a,c)=1, (c,</w>)=1;
    // the (a,b)/(b,</w>) tie breaks on sym_a ascending
    val docs = Seq((1L, "ab ab"), (2L, "ab ac")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(docs, topN = 10)
      .select($"rank", $"sym_a", $"sym_b", $"pair_count")
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1, "a", "b", 3L)), got.mkString(", "))
    assert(got(1) == ((2, "b", "</w>", 3L)))
    assert(got(2) == ((3, "a", "c", 1L)))
    assert(got(3) == ((4, "c", "</w>", 1L)))
    assert(got.length == 4)
  }

  test("bpe pair stats: single-char words pair with the end marker only") {
    import graft.text.TextAnalysis
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(docs, topN = 10)
      .select($"sym_a", $"sym_b", $"pair_count")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "</w>", 2L), ("b", "</w>", 1L)))
  }

  test("perplexity buckets: tercile cuts from the sample, stable stats") {
    import graft.text.LanguageModel
    // 9 scored docs; the "sample" is the full set, so the cut ranks are
    // ceil(9/3)=3 -> ce=1.3 and ceil(18/3)=6 -> ce=1.6: head = {1.1,
    // 1.2, 1.3}, middle = {1.4, 1.5, 1.6}, tail = {1.7, 1.8, 1.9}
    val scored = (1 to 9).map(i => (i.toLong, 10L, (10 + i) / 10.0))
      .toDF("doc_id", "n_bigrams", "cross_entropy")
    val got = LanguageModel.perplexityBuckets(scored, scored)
      .orderBy("bucket")
      .select($"bucket", $"n_docs", $"min_ce", $"max_ce", $"avg_ce")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).sameElements(Array("head", "middle", "tail")))
    assert(got.forall(_._2 == 3L), got.mkString(", "))
    assert(got(0)._3 == 1.1 && got(0)._4 == 1.3 && got(0)._5 == 1.2)
    assert(got(2)._3 == 1.7 && got(2)._4 == 1.9 && got(2)._5 == 1.8)
  }

  test("perplexity buckets: cuts come from the sample, not the corpus") {
    import graft.text.LanguageModel
    val scored = (1 to 100).map(i => (i.toLong, 10L, i.toDouble))
      .toDF("doc_id", "n_bigrams", "cross_entropy")
    // sample = low tercile only -> both cuts land inside it, so almost
    // the whole corpus classifies as tail
    val sample = scored.filter($"cross_entropy" <= 30.0)
    val got = LanguageModel.perplexityBuckets(scored, sample)
      .select($"bucket", $"n_docs").as[(String, Long)].collect().toMap
    assert(got("tail") == 80L, got.toString) // cut2 = ce at rank 20
  }
}
