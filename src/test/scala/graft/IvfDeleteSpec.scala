package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** IVF tombstone deletion (`vs_ivf_delete`): recall floor at every SF,
  * occupancy accounting against independent counts, and the
  * no-retrain contract (centroids identical to the stored manifest's).
  */
class IvfDeleteSpec extends SparkSpec {

  test("vs_ivf_delete clears the recall floor at sf0.001 / sf0.01 / sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("vs_ivf_delete")(spark, dir).collect()
      assert(rows.length == 8, s"$dir: expected one row per cell")
      val ppm = rows.head.getAs[Long]("mean_recall_ppm")
      info(s"$dir mean_recall_ppm=$ppm")
      assert(rows.forall(_.getAs[Long]("below_floor") == 0L),
        s"$dir: mean recall $ppm ppm under floor ${VectorSearch.IvfDeleteRecallFloorPpm}")
    }
  }

  test("occupancy accounting: totals match independent corpus counts, n_after = n_before - n_deleted") {
    val rows = SparkEntry.queries("vs_ivf_delete")(spark, sf).collect()
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val nVictims = e.filter(col("vec_id") % VectorSearch.DeleteMod === 0).count()
    assert(rows.map(_.getAs[Long]("n_before")).sum == n,
      "per-cell n_before does not sum to the corpus size")
    assert(rows.map(_.getAs[Long]("n_deleted")).sum == nVictims,
      "per-cell n_deleted does not sum to the tombstone count")
    for (r <- rows)
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_deleted"),
        s"cell ${r.getAs[Long]("cell")}: occupancy arithmetic broken")
    // a 1-in-40 delete must actually delete something at this SF
    assert(nVictims > 0 && rows.map(_.getAs[Long]("n_deleted")).sum > 0)
  }

  test("deletion does not retrain: centroid norms equal the stored-index manifest's") {
    // vs_ivf_store's manifest hashes the SAME trained model (full-corpus
    // integer Lloyd); a delete that perturbed the centroids would break
    // this equality — tombstones prune the assignment, never the model.
    val del = SparkEntry.queries("vs_ivf_delete")(spark, sf).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("centroid_norm2")).toMap
    val store = SparkEntry.queries("vs_ivf_store")(spark, sf).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("centroid_norm2")).toMap
    assert(del == store, s"centroids diverged: delete=$del store=$store")
  }
}
