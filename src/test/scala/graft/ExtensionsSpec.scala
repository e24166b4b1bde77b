package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SQL-surface registration of the native expressions (S9 parity
  * between the Column API and spark.sql). */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API") {
    GraftExtensions.register(spark)
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("ext_emb")
    Tables.load(spark, sfDir, "documents").createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS c
        |FROM ext_emb WHERE vec_id < 20""".stripMargin)
    val viaCol = Tables.load(spark, sfDir, "embeddings")
      .where($"vec_id" < 20)
      .select($"vec_id",
        graft.functions.VectorFunctions.cosine($"embedding", $"embedding").as("c"))
    assertSameRows(viaSql, viaCol)

    val sqlHash = spark.sql(
      """SELECT doc_id, simhash64(split(text, ' ')) AS sig,
        |  word_shingles(split(text, ' '), 3) AS sh
        |FROM ext_docs WHERE doc_id < 20""".stripMargin)
    val colHash = Tables.load(spark, sfDir, "documents")
      .where($"doc_id" < 20)
      .select($"doc_id",
        graft.dedup.Dedup.simhash64($"text").as("sig"),
        graft.dedup.Dedup.shingles($"text", 3).as("sh"))
    assertSameRows(sqlHash, colHash)

    val topk = spark.sql(
      """SELECT top_k_by(CAST(vec_id AS DOUBLE), vec_id, 3) AS t
        |FROM ext_emb""".stripMargin)
      .select(explode($"t").as("e")).select($"e.id").as[Long].collect()
    assert(topk.length == 3 && topk(0) == topk.max)

    // non-native arg types (decimal score, int id) are cast at analysis
    // time, not ClassCastException'd executor-side
    val cast = spark.sql(
      """SELECT top_k_by(vec_id * 1.5, CAST(vec_id AS INT), 2) AS t
        |FROM ext_emb""".stripMargin)
      .select(explode($"t").as("e")).select($"e.id").as[Long].collect()
    assert(cast.length == 2 && cast(0) == cast.max)
  }

  test("approx_top_k is SQL-callable and matches the Column API") {
    GraftExtensions.register(spark)
    Tables.load(spark, sfDir, "documents").createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      """SELECT t.item, t.cnt FROM (
        |  SELECT explode(approx_top_k(token, 5, 1024)) AS t FROM (
        |    SELECT explode(split(text, ' ')) AS token FROM ext_docs2))""".stripMargin)
    val viaCol = Tables.load(spark, sfDir, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .agg(graft.functions.HeavyHitters.approxTopK($"token", 5, 1024).as("tk"))
      .select(explode($"tk").as("t")).select($"t.item", $"t.cnt")
    assertSameRows(viaSql, viaCol)
  }

  test("deletion_hashes and vector_avg are SQL-callable") {
    GraftExtensions.register(spark)
    // "abc" with <=1 deletion: {abc, bc, ac, ab}
    val n = spark.sql("SELECT size(deletion_hashes('abc', 1)) AS n")
      .head().getInt(0)
    assert(n == 4)
    val m = spark.sql(
      """SELECT vector_avg(v) AS m FROM VALUES
        |(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))),
        |(array(CAST(3.0 AS DOUBLE), CAST(6.0 AS DOUBLE))) AS t(v)""".stripMargin)
      .head().getSeq[Double](0)
    assert(m == Seq(2.0, 4.0))
  }

  test("deletion_hashes rejects non-string input at analysis time") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT deletion_hashes(42, 1)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
  }

  test("extension class injects functions at session build time") {
    // separate session from the shared one, extension-configured
    val s2 = SparkEnv.builder("local[2]", 2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("ext-test")
      .getOrCreate()
    // getOrCreate may return the existing session; only assert when the
    // extension path actually constructed it
    val ok = scala.util.Try(
      s2.sql("SELECT cosine_similarity(array(1.0F,0.0F), array(1.0F,0.0F))")
        .head().getDouble(0))
    assert(ok.isFailure || math.abs(ok.get - 1.0) < 1e-12)
  }
}
