package graft

import graft.ops.{IvfIndex, VectorSearch}
import org.apache.spark.sql.functions._

/** The stored IVF-index lifecycle (`vs_ivf_store` / `vs_ivf_load`,
  * r15 — the IVF half of the r14 verdict's stored-artifact item): the
  * persisted centroid + bucketed assignment tables must serve the
  * exact vs_ivf_trained grading from a COLD session, and the manifest
  * must equal an independent recount of a fresh trainer run.
  */
class IvfStoreSpec extends SparkSpec {

  test("store manifest matches an independent trainer recount") {
    val rows = SparkEntry.queries("vs_ivf_store")(spark, sf).collect()
    assert(rows.length == 8, s"expected 8 cells, got ${rows.length}")
    // Independent replay: train again (integer Lloyd is deterministic)
    // and recount occupancy + centroid norms with plain Dataset ops.
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val mx = e.agg(max(array_max(transform(col("embedding"), x => abs(x))))).head().getDouble(0)
    val qv = e.select(col("vec_id"),
      transform(col("embedding"), x => round(x * 127.0 / mx, 0).cast("long")).as("q"))
    val model = IvfIndex.fitInt(qv, "vec_id", "q", k = 8, iters = 2)
    val occ = qv.select(IvfIndex.intCellOf(col("q"), model).as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getAs[Int]("cell").toLong -> r.getLong(1)).toMap
    val norms = model.centroids
      .map { case (cid, cv) => cid.toLong -> cv.map(x => x * x).sum }.toMap
    for (r <- rows) {
      val cell = r.getLong(0)
      assert(r.getLong(1) == occ.getOrElse(cell, 0L), s"cell $cell occupancy")
      assert(r.getLong(2) == norms(cell), s"cell $cell centroid norm")
    }
  }

  test("cold session serves vs_ivf_trained's exact grades from the stored index") {
    SparkEntry.queries("vs_ivf_store")(spark, sf).collect()
    val base = SparkEntry.queries("vs_ivf_trained")(spark, sf).collect()
    val cold = spark.newSession()
    val served = SparkEntry.queries("vs_ivf_load")(cold, sf).collect()
    assert(served.map(_.toSeq).toSeq == base.map(_.toSeq).toSeq,
      "cold-start IVF serve diverged from the trained grading")
  }

  test("the reloaded assignment is a bucketed parquet FileScan of the external store") {
    SparkEntry.queries("vs_ivf_store")(spark, sf).collect()
    val cold = spark.newSession()
    val plan = cold.table(VectorSearch.storedTable("graft_ivf_assign", sf)).queryExecution.executedPlan.toString()
    assert(plan.contains("FileScan parquet"), s"not a FileScan:\n$plan")
    val desc = cold.sql("DESCRIBE FORMATTED " + VectorSearch.storedTable("graft_ivf_assign", sf)).collect()
    val loc = desc.find(_.getString(0).trim == "Location").map(_.getString(1)).getOrElse("")
    assert(loc.contains("graft-ivfstore"), s"location '$loc' not the external store")
    val buckets = desc.find(_.getString(0).trim.startsWith("Num Buckets")).map(_.getString(1))
    assert(buckets.exists(_.trim == VectorSearch.IvfStoreBuckets.toString),
      s"assignment not bucketed as written: $buckets")
  }
}
