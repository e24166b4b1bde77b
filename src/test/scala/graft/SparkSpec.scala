package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run in
  * the forked test JVM). */
object TestSession {
  lazy val spark: SparkSession =
    SparkEnv.builder("local[4]", shufflePartitions = 4).getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Test data scale dir — overridable so the suites run against any
    * copy of the harness testdata layout, not one hardcoded box path. */
  val sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

  /** Order-insensitive exact comparison via except in both directions. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.sorted.toIndexedSeq
    val l = a.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val r = b.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val onlyL = l.exceptAll(r).count()
    val onlyR = r.exceptAll(l).count()
    assert(onlyL == 0 && onlyR == 0,
      s"rows differ: $onlyL only-left, $onlyR only-right")
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
