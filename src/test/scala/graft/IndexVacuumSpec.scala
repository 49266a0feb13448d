package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** Stored-index compaction (`vs_index_vacuum`): the vacuumed generation
  * must carry strictly fewer data files than the two-append tombstoned
  * one (the file economics the op exists for), preserve exactly the
  * survivor rows, and keep the bucketed layout serving depends on.
  */
class IndexVacuumSpec extends SparkSpec {

  test("vacuum drops files and rows; content is exactly the survivors") {
    SparkEntry.queries("vs_index_vacuum")(spark, sf).collect()
    val (g0, g1, p0, p1) = VectorSearch.ensureIvfVacuum(spark, sf)
    val (f0, f1) = (parquetFiles(p0).size, parquetFiles(p1).size)
    info(s"gen0 files=$f0 gen1 files=$f1")
    assert(f1 < f0, s"vacuum did not reduce the file count: $f0 -> $f1")
    // content preservation: gen1 == gen0 anti-join tombstones, row-exact
    val surv = spark.table(g0)
      .filter(col("c_id") % VectorSearch.DeleteMod =!= 0)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val after = spark.table(g1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(after == surv, "vacuumed generation is not exactly the survivor set")
    // no victim survived the rewrite
    assert(spark.table(g1)
      .filter(col("c_id") % VectorSearch.DeleteMod === 0).count() == 0L)
  }

  test("the compacted generation keeps the bucketed serving layout") {
    SparkEntry.queries("vs_index_vacuum")(spark, sf).collect()
    val (_, g1, _, _) = VectorSearch.ensureIvfVacuum(spark, sf)
    val desc = spark.sql(s"DESCRIBE FORMATTED $g1").collect()
    val buckets = desc.find(_.getString(0).trim.startsWith("Num Buckets"))
      .map(_.getString(1))
    assert(buckets.exists(_.trim == VectorSearch.IvfVacuumBuckets.toString),
      s"gen1 not bucketed as written: $buckets")
    val cols = desc.find(_.getString(0).trim.startsWith("Bucket Columns"))
      .map(_.getString(1))
    assert(cols.exists(_.contains("cell")), s"gen1 bucket column: $cols")
  }

  test("manifest arithmetic: before = dead + after, checksums consistent") {
    val r = SparkEntry.queries("vs_index_vacuum")(spark, sf).head()
    assert(r.getAs[Long]("n_rows_before") ==
      r.getAs[Long]("n_rows_dead") + r.getAs[Long]("n_rows_after"))
    assert(r.getAs[Long]("n_rows_before") == Tables.embeddings(spark, sf).count())
    assert(r.getAs[Long]("cellsum_after") <= r.getAs[Long]("cellsum_before"))
  }
}
