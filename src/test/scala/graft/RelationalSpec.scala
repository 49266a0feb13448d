package graft

import graft.ops.Relational

class RelationalSpec extends SparkSpec {
  test("q1_agg groups by flag/status with exact cent sums") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 12)
    val r = rows.head
    assert(r.getAs[Long]("sum_qty_c") > 0)
    assert(r.getAs[Long]("avg_price_c") > 0)
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = Relational.q3JoinTopk(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("revenue_c")).toSeq
    assert(revs == revs.sortBy(-_))
  }

  test("q4 semi-join covers all priorities") {
    val rows = Relational.q4Semijoin(spark, sf).collect()
    assert(rows.length == 5)
  }

  test("q5 multijoin yields ASIA nations only") {
    val rows = Relational.q5Multijoin(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
  }

  test("q7 window rank caps at 3 per supplier") {
    val rows = Relational.q7Window(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rev_rank") <= 3))
  }

  test("q8 rollup has grand-total row") {
    val rows = Relational.q8Rollup(spark, sf).collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("q9 anti-join excludes big-order customers") {
    val rows = Relational.q9Antijoin(spark, sf).collect()
    assert(rows.nonEmpty)
  }

  test("q10 top-n per segment is 3 per group") {
    val rows = Relational.q10TopnGroup(spark, sf).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    assert(bySeg.values.forall(_.length == 3))
  }
}
