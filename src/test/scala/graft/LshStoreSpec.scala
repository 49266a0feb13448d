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
