package graft

import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorFunctions => VF}
import graft.sim.Similarity
import graft.sources.Tables

/** Vector ops: codegen'd expression vs higher-order-function
  * differential; bounded-heap top-k aggregate vs window formulation;
  * LSH recall against brute force. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("codegen cosine == HOF cosine (differential over real vectors)") {
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va")).where($"ia" < 50)
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb")).where($"ib" < 50)
    val diff = a.crossJoin(b)
      .select(abs(VF.cosine($"va", $"vb") - VF.cosineHof($"va", $"vb")).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diff < 1e-12, s"codegen vs HOF diverged by $diff")
  }

  test("cosine of a vector with itself is 1") {
    val selfSim = emb.select(VF.cosine($"embedding", $"embedding").as("c"))
      .agg(min($"c"), max($"c")).as[(Double, Double)].head()
    assert(math.abs(selfSim._1 - 1.0) < 1e-9 && math.abs(selfSim._2 - 1.0) < 1e-9)
  }

  test("TopKByScore aggregate == window row_number top-k") {
    val queries = emb.where($"vec_id" < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 7)
      .select("query_id", "neighbor_id", "rank")
    // window formulation as the oracle
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val scored = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
      .crossJoin(broadcast(q))
      .where($"neighbor_id" =!= $"query_id")
      .select($"query_id", $"neighbor_id", VF.cosine($"qv", $"cv").as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    val win = scored.withColumn("rank", row_number().over(w))
      .where($"rank" <= 7)
      .select("query_id", "neighbor_id", "rank")
    assertSameRows(bf, win)
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val queries = emb.where($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id")
    val lsh = Similarity.lshTopK(emb, queries, k = 5, bits = 4, tables = 8)
      .select("query_id", "neighbor_id")
    val hit = bf.intersect(lsh).count().toDouble
    val recall = hit / bf.count()
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("hyperplane sign bits are deterministic and bounded") {
    val b1 = emb.select(VF.hyperplaneSignBits($"embedding", 8, 1L).as("b"))
    val b2 = emb.select(VF.hyperplaneSignBits($"embedding", 8, 1L).as("b"))
    assertSameRows(b1, b2)
    val range = b1.agg(min($"b"), max($"b")).as[(Long, Long)].head()
    assert(range._1 >= 0L && range._2 < 256L)
  }

  test("topKBy keeps k best with deterministic tiebreak") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0), (4L, 9.0)).toDF("id", "score")
    val out = df.agg(TopKAgg.topKBy($"score", $"id", 2).as("t"))
      .select(explode($"t").as("e")).select($"e.id", $"e.score")
      .as[(Long, Double)].collect()
    assert(out.toSeq == Seq((4L, 9.0), (1L, 5.0)))
  }
}
