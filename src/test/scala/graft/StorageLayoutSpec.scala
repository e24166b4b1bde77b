package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Write-side layout operators: bucketing for shuffle-free joins and
  * sort-within-partitions clustering (the `ORDER BY` sort-key analog,
  * S6 — `init_clickhouse_raw_tables.sql:37`). */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // tiny test tables would broadcast; force the sort-merge path the
    // bucketing exists for (at fact×fact scale broadcast is off the
    // table anyway)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val ord = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previous JVM's managed-table location survives catalog drops
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) { 
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(d)
      }
    }
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // co-located join: no Exchange below the SortMergeJoin
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan.take(600))
    val below = plan.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      "bucketed join should not reshuffle:\n" + below.take(600))

    // and it computes the right thing
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assertSameRows(joined, expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("sorted clustered write: files are sorted by the cluster key") {
    val out = tmpDir("graft-cluster")
    val li = Tables.load(spark, sfDir, "lineitem")
    li.repartition(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(out)

    // each file must be internally sorted (min/max stats then skip scans)
    import spark.implicits._
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 2)
    files.foreach { f =>
      val keys = spark.read.parquet(f)
        .select(col("l_orderkey") * 10 + col("l_linenumber"))
        .as[Long].collect()
      assert(keys.sameElements(keys.sorted), s"file $f not sorted")
    }
  }

  test("morton interleave: bijective on the grid, locality-ordered") {
    import graft.functions.MortonInterleave.interleave
    // bijectivity on a 64x64 grid; interleaved bit positions
    val codes = for (a <- 0L until 64L; b <- 0L until 64L) yield interleave(a, b)
    assert(codes.distinct.size == codes.size)
    assert(interleave(1, 0) == 1L && interleave(0, 1) == 2L &&
      interleave(3, 3) == 15L)
    // SQL surface agrees with the Scala kernel
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT morton_interleave(5, 9)").head().getLong(0)
      == interleave(5, 9))
  }

  test("z-order clustering bounds per-file ranges in both dimensions") {
    import spark.implicits._
    val grid = spark.range(0, 256).select($"id".as("x"))
      .crossJoin(spark.range(0, 256).select($"id".as("y")))
    val zDir = tmpDir("graft-zorder")
    val linDir = tmpDir("graft-linear")
    graft.functions.ZOrder.clusteredWrite(grid, $"x", $"y", zDir, 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    // per-file min/max footprint — what parquet min-max pruning sees
    def files(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    def spans(dir: String, c: String): Seq[(Long, Long)] = files(dir).map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
      (r.getLong(0), r.getLong(1))
    }
    // a y-only box predicate: how many files could contain y < 16?
    def hit(spans: Seq[(Long, Long)]) = spans.count { case (lo, _) => lo < 16 }
    val zHits = hit(spans(zDir, "y"))
    val linHits = hit(spans(linDir, "y"))
    // linear x-sort leaves y spanning 0..255 in EVERY file (no pruning);
    // the z-curve bounds y per file, so most files are skippable
    assert(linHits == files(linDir).size,
      s"expected linear layout to be unprunable on y, got $linHits")
    assert(zHits * 2 <= files(zDir).size,
      s"z-order should prune most files for y<16: $zHits of ${files(zDir).size} hit")
    // and x stays prunable too (bounded spans in the same files)
    val xSpanMax = spans(zDir, "x").map { case (lo, hi) => hi - lo }.max
    assert(xSpanMax < 256, "z-order should bound x within files as well")
  }
}
