package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** LSH append maintenance (`vs_lsh_upsert`): manifest arithmetic against
  * independent counts at every SF, the frozen-geometry contract, the
  * reband signal's flip mechanics, and the serving proof — an appended
  * near-duplicate is FOUND through the merged band table.
  */
class LshUpsertSpec extends SparkSpec {

  test("manifest arithmetic holds at sf0.001 / sf0.01 / sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val r = SparkEntry.queries("vs_lsh_upsert")(spark, dir).head()
      val e = Tables.embeddings(spark, dir)
      val nBase = e.filter(col("vec_id") % VectorSearch.UpsertMod =!= 0).count()
      val nNew = e.filter(col("vec_id") % VectorSearch.UpsertMod === 0).count()
      assert(r.getAs[Long]("n_base") == nBase && r.getAs[Long]("n_new") == nNew)
      // geometry is frozen at the BASE count — the stored artifact's pick
      val (gr, gb) = VectorSearch.lshAdaptiveGeometry(nBase, VectorSearch.lshTunedGeo)
      assert(r.getAs[Long]("geo_r") == gr && r.getAs[Long]("geo_b") == gb,
        s"$dir: geometry not frozen at the base count")
      // every vector contributes exactly b band rows to the merged table
      assert(r.getAs[Long]("n_rows_after") == (nBase + nNew) * gb,
        s"$dir: merged band table row count off")
      // the reband signal is exactly the adaptive table re-consulted at
      // the grown count
      val due = if (VectorSearch.lshAdaptiveGeometry(nBase + nNew,
        VectorSearch.lshTunedGeo) != ((gr, gb))) 1L else 0L
      assert(r.getAs[Long]("reband_due") == due, s"$dir: reband flag wrong")
      info(s"$dir r=$gr b=$gb max_bucket=${r.getAs[Long]("max_bucket_after")}")
    }
  }

  test("the reband signal CAN flip: the adaptive table has boundaries to cross") {
    // A corpus that grows past a table boundary must change the pick —
    // otherwise reband_due is vacuous. 1k → 200k crosses several.
    val small = VectorSearch.lshAdaptiveGeometry(1000L, VectorSearch.lshTunedGeo)
    val large = VectorSearch.lshAdaptiveGeometry(200000L, VectorSearch.lshTunedGeo)
    assert(small != large, s"adaptive pick constant across 200×: $small")
    // and right at a boundary, base-vs-grown differ (the flip the flag
    // reports): find the smallest n whose pick differs from n-1's
    val boundary = (2L to 300000L).find(n =>
      VectorSearch.lshAdaptiveGeometry(n, VectorSearch.lshTunedGeo) !=
        VectorSearch.lshAdaptiveGeometry(n - 1, VectorSearch.lshTunedGeo))
    assert(boundary.nonEmpty, "no geometry boundary in the tuned table")
    info(s"first tuned-geometry boundary at n=${boundary.get}")
  }

  test("serving proof: an appended near-duplicate pairs with its base twin through the merged table") {
    // Planted corpus: 199 base vectors + one batch vector (id 200,
    // % 50 = 0) that is a tiny perturbation of base id 1. The batch
    // hashes at the FROZEN base geometry; the pair must co-bucket in
    // some band (deterministic planes — sim ≈ 0.9999 agrees on
    // virtually every hyperplane) and survive the exact-cosine verify.
    val sess = spark
    import sess.implicits._
    def vec(seed: Long, eps: Double): Seq[Float] =
      (0 until 64).map(i => (math.sin(seed * 31 + i).toFloat
        + (if (i == 0) eps.toFloat else 0f)))
    val rows = (1L to 200L).filter(_ % VectorSearch.UpsertMod != 0)
      .map(id => (id, vec(id, 0.0))) :+ ((200L, vec(1L, 0.001)))
    val e = rows.toDF("vec_id", "embedding")
    val nBase = rows.size - 1L
    val (r, b) = VectorSearch.lshAdaptiveGeometry(nBase, VectorSearch.lshTunedGeo)
    val bands = VectorSearch.lshBands(e, "vec_id", "embedding",
      planesPerBand = r, bands = b)
    val cand = graft.util.Skew.cappedSelfPairs(bands, "vec_id",
      Seq("band_idx", "band_val"), VectorSearch.LshBucketCap)
    val hit = cand.filter(col("a_id") === 1L && col("b_id") === 200L).count()
    assert(hit == 1L, "appended near-dup did not co-bucket with its base twin")
  }
}
