package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** The stored LSH band-table lifecycle (`vs_lsh_store` / `vs_lsh_load`,
  * r15 — completes the stored-index posture across all three index
  * families): the persisted bucketed band table must serve the exact
  * vs_lsh_tuned near-dup contract from a COLD session, paying the
  * signature-hashing cost once at store time instead of per query.
  */
class LshStoreSpec extends SparkSpec {

  test("store manifest matches an independent recount of a fresh signature frame") {
    val row = SparkEntry.queries("vs_lsh_store")(spark, sf).collect()
    assert(row.length == 1)
    val r = row.head
    // Independent replay: regenerate the signature frame (deterministic
    // planes) and recount with plain Dataset ops.
    val bands = VectorSearch.lshBandsAdaptive(
      Tables.embeddings(spark, sf).select("vec_id", "embedding"),
      "vec_id", "embedding", geo = VectorSearch.lshTunedGeo)
    val sizes = bands.groupBy("band_idx", "band_val").count()
    assert(r.getAs[Long]("n_rows") == bands.count())
    assert(r.getAs[Long]("n_buckets") == sizes.count())
    assert(r.getAs[Long]("max_bucket") ==
      sizes.agg(max("count")).head().getLong(0))
    assert(r.getAs[Long]("sum_band_val") ==
      bands.agg(sum("band_val")).head().getLong(0))
  }

  test("cold session serves vs_lsh_tuned's exact pairs from the stored band table") {
    SparkEntry.queries("vs_lsh_store")(spark, sf).collect()
    val base = SparkEntry.queries("vs_lsh_tuned")(spark, sf).collect()
    val cold = spark.newSession()
    val served = SparkEntry.queries("vs_lsh_load")(cold, sf).collect()
    assert(served.map(_.toSeq).toSeq == base.map(_.toSeq).toSeq,
      "cold-start LSH serve diverged from the tuned near-dup output")
  }

  test("store-time mask excises a planted hot bucket, alarms, and keeps healthy buckets intact") {
    import spark.implicits._
    // A planted degenerate bucket (6 rows in one (band_idx, band_val))
    // beside healthy ones — driven at cap=3 so the hostile shape is
    // testable without hashing >LshBucketCap vectors.
    val planted = (
      (1L to 6L).map(id => (id, 0, 777L)) ++          // hot: 6 > cap
      Seq((1L, 1, 10L), (2L, 1, 11L), (3L, 1, 10L))   // healthy band 1
    ).toDF("vec_id", "band_idx", "band_val")
    val errBuf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    val masked = try {
      System.setErr(new java.io.PrintStream(errBuf))
      VectorSearch.maskDegenerateBands(planted, cap = 3L, tag = "spec-hot")
        .collect()
    } finally System.setErr(oldErr)
    assert(!masked.exists(_.getLong(2) == 777L),
      "hot-bucket rows survived the store-time mask")
    assert(masked.length == 3, s"healthy rows damaged: ${masked.length} != 3")
    assert(VectorSearch.lastStoreMaskExcised.get() == 6L,
      s"excised counter ${VectorSearch.lastStoreMaskExcised.get()} != 6")
    assert(errBuf.toString.contains("STORE MASK ALARM"),
      "mask excised rows without alarming")
  }

  test("store-time mask is a row-exact no-op on the healthy test corpus") {
    val bands = VectorSearch.lshBandsAdaptive(
      Tables.embeddings(spark, sf).select("vec_id", "embedding"),
      "vec_id", "embedding", geo = VectorSearch.lshTunedGeo)
    val n = bands.count()
    assert(VectorSearch.maskDegenerateBands(bands, tag = "spec-noop").count() == n,
      "the default cap excised rows from a healthy corpus - hashes would drift")
    assert(VectorSearch.lastStoreMaskExcised.get() == 0L)
  }

  test("the reloaded band table is a bucketed parquet FileScan of the external store") {
    SparkEntry.queries("vs_lsh_store")(spark, sf).collect()
    val cold = spark.newSession()
    val plan = cold.table(VectorSearch.storedTable("graft_lsh_bands", sf)).queryExecution.executedPlan.toString()
    assert(plan.contains("FileScan parquet"), s"not a FileScan:\n$plan")
    val desc = cold.sql("DESCRIBE FORMATTED " + VectorSearch.storedTable("graft_lsh_bands", sf)).collect()
    val loc = desc.find(_.getString(0).trim == "Location").map(_.getString(1)).getOrElse("")
    assert(loc.contains("graft-lshstore"), s"location '$loc' not the external store")
    val buckets = desc.find(_.getString(0).trim.startsWith("Num Buckets")).map(_.getString(1))
    assert(buckets.exists(_.trim == VectorSearch.LshStoreBuckets.toString),
      s"band table not bucketed as written: $buckets")
  }
}
