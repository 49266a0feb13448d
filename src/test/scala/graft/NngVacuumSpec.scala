package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** NNG edge-table compaction (`vs_nng_vacuum`): the vacuumed generation
  * must carry strictly fewer data files than the two-append tombstoned
  * one, preserve exactly the surviving edges (either-endpoint victim
  * rule — the same edges vs_nng_delete's serve filters out), and keep
  * the src-bucketed layout the hop join prunes on.
  */
class NngVacuumSpec extends SparkSpec {

  private def isDead = col("src") % VectorSearch.DeleteMod === 0 ||
    col("dst") % VectorSearch.DeleteMod === 0

  test("vacuum drops files and rows; content is exactly the surviving edges") {
    SparkEntry.queries("vs_nng_vacuum")(spark, sf).collect()
    val (g0, g1, p0, p1) = VectorSearch.ensureNngVacuum(spark, sf)
    val (f0, f1) = (parquetFiles(p0).size, parquetFiles(p1).size)
    info(s"gen0 files=$f0 gen1 files=$f1")
    assert(f1 < f0, s"vacuum did not reduce the file count: $f0 -> $f1")
    val surv = spark.table(g0).filter(!isDead)
      .collect().map(_.toSeq.toList).sortBy(_.toString()).toSeq
    val after = spark.table(g1)
      .collect().map(_.toSeq.toList).sortBy(_.toString()).toSeq
    assert(after == surv, "vacuumed generation is not exactly the survivor set")
    // no edge touching a victim survived the rewrite
    assert(spark.table(g1).filter(isDead).count() == 0L)
  }

  test("the compacted generation keeps the src-bucketed serving layout") {
    SparkEntry.queries("vs_nng_vacuum")(spark, sf).collect()
    val (_, g1, _, _) = VectorSearch.ensureNngVacuum(spark, sf)
    val desc = spark.sql(s"DESCRIBE FORMATTED $g1").collect()
    val buckets = desc.find(_.getString(0).trim.startsWith("Num Buckets"))
      .map(_.getString(1))
    assert(buckets.exists(_.trim == VectorSearch.NngStoreBuckets.toString),
      s"gen1 not bucketed as written: $buckets")
    val cols = desc.find(_.getString(0).trim.startsWith("Bucket Columns"))
      .map(_.getString(1))
    assert(cols.exists(_.contains("src")), s"gen1 bucket column: $cols")
  }

  test("manifest arithmetic: before = dead + after, checksums consistent") {
    val r = SparkEntry.queries("vs_nng_vacuum")(spark, sf).head()
    assert(r.getAs[Long]("n_edges_before") ==
      r.getAs[Long]("n_edges_dead") + r.getAs[Long]("n_edges_after"))
    assert(r.getAs[Long]("n_edges_before") > 0L)
    assert(r.getAs[Long]("n_edges_dead") > 0L,
      "tombstone rule matched no edges — the cycle under test is empty")
    assert(r.getAs[Long]("d2sum_after") <= r.getAs[Long]("d2sum_before"))
  }
}
