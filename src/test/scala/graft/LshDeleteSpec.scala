package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** LSH tombstone deletion (`vs_lsh_delete`): cleanliness by
  * construction (no victim in any served pair), the frozen-geometry
  * contract, and the planted proof that a tombstone actually removes
  * its pairs from the serve.
  */
class LshDeleteSpec extends SparkSpec {

  test("no victim id appears in the served pairs, at all three SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("vs_lsh_delete")(spark, dir).collect()
      assert(rows.nonEmpty, s"$dir: near-dup serve returned nothing")
      assert(rows.forall(r => r.getLong(0) % VectorSearch.DeleteMod != 0
        && r.getLong(1) % VectorSearch.DeleteMod != 0),
        s"$dir: a tombstoned id appeared in a served pair")
    }
  }

  test("planted twin: the pair serves before the tombstone, vanishes after") {
    // base corpus of 200 ids; id 80 (a %40 victim) is a near-copy of
    // id 1. Through the FULL band table the pair must co-bucket; after
    // the tombstone anti-join it must be gone — deletion removes
    // exactly the victim's pairs, nothing else.
    val sess = spark
    import sess.implicits._
    def vec(seed: Long, eps: Double): Seq[Float] =
      (0 until 64).map(i => math.sin(seed * 31 + i).toFloat
        + (if (i == 0) eps.toFloat else 0f))
    val rows = (1L to 200L).map(id =>
      (id, if (id == 80L) vec(1L, 0.001) else vec(id, 0.0)))
    val e = rows.toDF("vec_id", "embedding")
    val (r, b) = VectorSearch.lshAdaptiveGeometry(rows.size.toLong,
      VectorSearch.lshTunedGeo)
    val bands = VectorSearch.lshBands(e, "vec_id", "embedding",
      planesPerBand = r, bands = b)
    def pairs(src: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      graft.util.Skew.cappedSelfPairs(src, "vec_id",
          Seq("band_idx", "band_val"), VectorSearch.LshBucketCap)
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    val full = pairs(bands)
    assert(full.contains((1L, 80L)), "planted twin did not co-bucket pre-delete")
    val pruned = pairs(bands.filter(col("vec_id") % VectorSearch.DeleteMod =!= 0))
    assert(!pruned.exists(p => p._1 == 80L || p._2 == 80L),
      "tombstoned id survived in the pruned candidates")
    // nothing ELSE was lost: every surviving full-table pair remains
    val fullSurv = full.filterNot(p =>
      p._1 % VectorSearch.DeleteMod == 0 || p._2 % VectorSearch.DeleteMod == 0)
    assert(fullSurv.subsetOf(pruned), "deletion dropped survivor pairs")
  }
}
