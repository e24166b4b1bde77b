package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q271-q275 pack: matching laws (node-
  * disjointness, maximality at the round horizon), NB classifier
  * structure, Fellegi–Sunter weight signs, consistent-hash movement
  * theory, and QTE monotonicity. */
class Pack33Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q271: matched pairs are node-disjoint edges of the pair graph") {
    val m = q("q271_dominant_matching")
      .select("match_round", "id_a", "id_b", "dist")
      .as[(Int, Long, Long, Int)].collect()
    assert(m.nonEmpty)
    val nodes = m.flatMap(p => Seq(p._2, p._3))
    assert(nodes.distinct.length == nodes.length, "matching not node-disjoint")
    // every matched pair is a real edge with the claimed distance
    val edges = graft.queries.Analytics33.fuzzyPairsCached(spark, sfDir)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    m.foreach { case (r, a, b, d) =>
      assert(r >= 1 && r <= 3)
      assert(edges.get((a, b)).contains(d), s"($a,$b,$d) not an edge")
    }
    // round-1 matches are exactly the mutual-best pairs (dist, partner)
    val best = edges.toSeq
      .flatMap { case ((a, b), d) => Seq((a, (d, b)), (b, (d, a))) }
      .groupBy(_._1)
      .map { case (x, cands) => x -> cands.map(_._2).min }
    val mutual = best.collect {
      case (x, (d, y)) if best.get(y).contains((d, x)) && x < y => (x, y, d)
    }.toSet
    assert(m.filter(_._1 == 1).map(p => (p._2, p._3, p._4)).toSet == mutual)
  }

  test("q272: NB scores are negative log-mass and accuracy beats the prior") {
    val rows = q("q272_nb_langid")
      .select("doc_id", "lang_true", "lang_nb", "score_units", "correct")
      .as[(Long, String, String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, t, p, su, c) =>
      assert(id % 5 == 0, s"doc $id not in the held-out split")
      assert(su < 0L, s"doc $id: log-score $su not negative")
      assert(c == (t == p))
    }
    // one verdict per held-out doc (the synthetic corpus shares most
    // vocabulary across langs, so accuracy itself is data-bound — the
    // oracle already pins the exact scores)
    val held = graft.sources.Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") % 5 === 0).count()
    assert(rows.length == held)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q273: FS weights reward agreement and every surviving pair agrees on band") {
    val rows = q("q273_fs_linkage")
      .select("id_a", "id_b", "same_segment", "same_band", "score_units")
      .as[(Long, Long, Boolean, Boolean, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, _, sb, su) =>
      assert(a < b)
      assert(su > 0L)
      // the band u-probability is small enough that no pair can be
      // positive without band agreement (segment alone can't carry it)
      assert(sb, s"pair ($a,$b) positive without band agreement")
    }
    // all-agree pairs dominate band-only pairs
    val allAgree = rows.filter(r => r._3 && r._4).map(_._5)
    val bandOnly = rows.filter(r => !r._3 && r._4).map(_._5)
    if (allAgree.nonEmpty && bandOnly.nonEmpty)
      assert(allAgree.min > bandOnly.max)
  }

  test("q274: movement matrix conserves keys and matches the 1/9 theory") {
    val rows = q("q274_consistent_hash")
      .select("shard_before", "shard_after", "n_keys", "share")
      .as[(Int, Int, Long, Double)].collect()
    val orders = graft.sources.Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_._3).sum == orders, "keys not conserved")
    rows.foreach { case (b, a, n, sh) =>
      assert(b >= 0 && b < 8 && a >= 0 && a < 9)
      assert(math.abs(sh - n.toDouble / orders) < 1e-6)
    }
    // consistent hashing moves keys ONLY to the new shard: a key's
    // clockwise successor changes only if the new shard's vnode lands
    // between the key and its old successor
    rows.filter(r => r._1 != r._2).foreach { case (b, a, _, _) =>
      assert(a == 8, s"key moved $b -> $a, not to the new shard")
    }
    // moved share ≈ 1/9 ± 5pp (hash variance at this key count)
    val moved = rows.filter(r => r._1 != r._2).map(_._4).sum
    assert(moved > 1.0 / 9 - 0.05 && moved < 1.0 / 9 + 0.05,
      s"moved share $moved far from 1/9")
  }

  test("q275: treated and control deciles are nondecreasing in d") {
    val rows = q("q275_qte")
      .select("decile", "q_treated", "q_control", "qte")
      .as[(Int, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1 to 9))
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(x, y) =>
        assert(x._2 <= y._2 && x._3 <= y._3, "deciles not monotone")
      case _ => ()
    }
    rows.foreach(r => assert(math.abs(r._4 - (r._2 - r._3)) < 1e-12))
  }
}
