package graft

import graft.sources.Tables

/** r12: `Tables.loadParallel` is scale-adaptive — it repartitions ONLY
  * when the scan is narrower than the session's cores, so on wide
  * (multi-split) input it adds no exchange at all. Both branches are
  * exercised on copies of the harness parquet (copies, because the
  * relation and partition-count memos key on the directory). */
class LoadParallelSpec extends SparkSpec {

  private def copyTable(name: String): String = {
    val dir = tmpDir(s"lp-$name")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/$name.parquet"),
      java.nio.file.Paths.get(s"$dir/$name.parquet"))
    dir
  }

  test("narrow scan (fewer splits than cores) is spread to the cores") {
    val dir = copyTable("documents")
    val plain = Tables.load(spark, dir, "documents")
    assume(plain.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val par = Tables.loadParallel(spark, dir, "documents")
    assert(par.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      "single-row-group scan must be spread across the cores")
    assert(par.count() == plain.count(), "repartition must not drop rows")
  }

  test("wide scan (at least as many splits as cores) is left alone") {
    val dir = copyTable("documents")
    val conf = spark.conf
    val oldMax = conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = conf.get("spark.sql.files.openCostInBytes")
    try {
      // force many byte-range splits of the single file so the scan is
      // wider than the 4-core test session
      conf.set("spark.sql.files.maxPartitionBytes", "2048")
      conf.set("spark.sql.files.openCostInBytes", "1024")
      val plain = Tables.loadFresh(spark, dir, "documents")
      val parts = plain.rdd.getNumPartitions
      assume(parts >= spark.sparkContext.defaultParallelism)
      val par = Tables.loadParallel(spark, dir, "documents")
      assert(par.rdd.getNumPartitions == parts,
        "an already-wide scan must NOT pay an extra round-robin exchange")
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }
}
