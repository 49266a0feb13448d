package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** LSH band-table compaction (`vs_lsh_vacuum`): the vacuumed generation
  * must carry strictly fewer data files than the two-append tombstoned
  * one, preserve exactly the survivor signatures, and keep the
  * band_val-bucketed layout the pair-join serving path prunes on.
  */
class LshVacuumSpec extends SparkSpec {

  test("vacuum drops files and rows; content is exactly the survivors") {
    SparkEntry.queries("vs_lsh_vacuum")(spark, sf).collect()
    val (g0, g1, p0, p1) = VectorSearch.ensureLshVacuum(spark, sf)
    val (f0, f1) = (parquetFiles(p0).size, parquetFiles(p1).size)
    info(s"gen0 files=$f0 gen1 files=$f1")
    assert(f1 < f0, s"vacuum did not reduce the file count: $f0 -> $f1")
    // content preservation: gen1 == gen0 anti-join tombstones, row-exact
    val surv = spark.table(g0)
      .filter(col("vec_id") % VectorSearch.DeleteMod =!= 0)
      .collect().map(_.toSeq.toList).sortBy(_.toString()).toSeq
    val after = spark.table(g1)
      .collect().map(_.toSeq.toList).sortBy(_.toString()).toSeq
    assert(after == surv, "vacuumed generation is not exactly the survivor set")
    // no victim signature survived the rewrite
    assert(spark.table(g1)
      .filter(col("vec_id") % VectorSearch.DeleteMod === 0).count() == 0L)
  }

  test("the compacted generation keeps the band_val-bucketed layout") {
    SparkEntry.queries("vs_lsh_vacuum")(spark, sf).collect()
    val (_, g1, _, _) = VectorSearch.ensureLshVacuum(spark, sf)
    val desc = spark.sql(s"DESCRIBE FORMATTED $g1").collect()
    val buckets = desc.find(_.getString(0).trim.startsWith("Num Buckets"))
      .map(_.getString(1))
    assert(buckets.exists(_.trim == VectorSearch.LshStoreBuckets.toString),
      s"gen1 not bucketed as written: $buckets")
    val cols = desc.find(_.getString(0).trim.startsWith("Bucket Columns"))
      .map(_.getString(1))
    assert(cols.exists(_.contains("band_val")), s"gen1 bucket column: $cols")
  }

  test("manifest arithmetic: before = dead + after, checksums consistent") {
    val r = SparkEntry.queries("vs_lsh_vacuum")(spark, sf).head()
    assert(r.getAs[Long]("n_rows_before") ==
      r.getAs[Long]("n_rows_dead") + r.getAs[Long]("n_rows_after"))
    // gen-0's logical content = the stored band table's: n rows per
    // vector per band at the full-count tuned geometry
    val n = Tables.embeddings(spark, sf).count()
    val (_, b) = VectorSearch.lshAdaptiveGeometry(n, VectorSearch.lshTunedGeo)
    assert(r.getAs[Long]("n_rows_before") == n * b)
    assert(r.getAs[Long]("bandsum_after") <= r.getAs[Long]("bandsum_before"))
  }
}
