package graft

/** Semantic invariants for the q436-q440 warehouse-integrity pack:
  * relationship coverage, key accounting, reconciliation honesty on
  * the deliberately-messy generator, and structural consistency. */
class Pack66Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q436: all seven FK edges audited; orphans never exceed rows") {
    val rows = q("q436_fk_orphans")
      .select("relationship", "n_child", "n_orphans")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r._2 > 0)
      assert(r._3 >= 0 && r._3 <= r._2)
    }
  }

  test("q437: all ten tables audited; key math is consistent") {
    val rows = q("q437_pk_uniqueness")
      .select("table_name", "n_rows", "n_keys", "rows_in_dup_keys")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._3 <= r._2, s"${r._1}: more keys than rows")
      // rows in dup keys = n_rows - n_keys + (#dup keys) >= excess
      assert(r._4 >= r._2 - r._3, s"${r._1}: dup-row accounting broken")
    }
  }

  test("q438: the generator's totalprice gap is real and reported") {
    val r = q("q438_totalprice_reconciliation")
      .select("n_orders_with_lines", "n_exact_match",
        "mean_abs_gap_dollars", "max_abs_gap_dollars")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 0)
    assert(r._2 >= 0 && r._2 <= r._1)
    assert(r._3 >= 0 && r._4 >= r._3)
  }

  test("q439: date sanity fractions and spans are plausible") {
    val r = q("q439_date_sanity")
      .select("n_lines", "ship_before_order", "frac_ship_before_order",
        "order_span_days", "event_span_days")
      .as[(Long, Long, Double, Long, Long)].head()
    assert(r._1 > 0)
    assert(r._3 >= 0 && r._3 <= 1)
    assert(math.abs(r._3 - r._2.toDouble / r._1) < 1e-5)
    assert(r._4 > 365, "order history shorter than a year")
    assert(r._5 >= 0)
  }

  test("q440: structural panel accounts for the order population") {
    val r = q("q440_structural_consistency")
      .select("n_orders", "orders_without_lines", "mean_lines",
        "max_lines", "orders_with_linenumber_gaps",
        "orders_with_dup_linenumbers")
      .as[(Long, Long, Double, Long, Long, Long)].head()
    assert(r._1 > 0)
    assert(r._2 >= 0 && r._2 <= r._1)
    assert(r._3 >= 0 && r._3 <= r._4)
    assert(r._5 >= 0 && r._5 <= r._1)
    assert(r._6 >= 0 && r._6 <= r._1)
  }
}
