package graft

/** Guards on the driver contract: a duplicate query name would silently
  * drop a query when the packs fold into a Map. */
class ContractSpec extends SparkSpec {

  test("query names are unique across packs") {
    val names = SparkEntry.packs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle belongs to a declared query") {
    val qnames = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qnames
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("oracles only reference harness tables") {
    // DuckDB table functions the oracles may scan (integer spines)
    val tableFns = Set("range", "generate_series", "unnest")
    val known = graft.sources.Tables.names.toSet ++ tableFns
    val tableRef = "(?i)FROM\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      // EXTRACT(field FROM expr) uses FROM as a keyword, not a scan
      val sql = rawSql.replaceAll("(?i)EXTRACT\\s*\\([^)]*\\)", "")
      tableRef.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        // subquery openers and CTE names are fine; flag unknown bare ids
        // (a recursive CTE may declare a column list: `cc(id, comp) AS (`;
        // a CTE may carry a materialization hint: `x AS MATERIALIZED (`)
        val ctes = ("(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([a-z0-9_,\\s]*\\))?" +
          "\\s+AS\\s*(?:NOT\\s+)?(?:MATERIALIZED\\s*)?\\(").r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        assert(known.contains(t) || ctes.contains(t) || t == "(",
          s"$name references unknown table '$t'")
      }
    }
  }

  test("jdbcSnapshot fails fast without a driver (documented boundary)") {
    // No JDBC driver ships in this environment; the wrapper must fail at
    // load() with a driver-resolution error, not hang or half-construct.
    val e = intercept[Exception] {
      graft.sources.CdcSource.jdbcSnapshot(spark,
        "jdbc:postgresql://localhost:5432/nope", "public.orders")
    }
    val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .toLowerCase
    assert(msg.contains("driver") || msg.contains("jdbc"),
      s"unexpected failure mode: ${e.getClass.getName}: ${e.getMessage}")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
