package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** The scheduled re-band (`vs_lsh_reband`) — the job `vs_lsh_upsert`'s
  * `reband_due` flag demands: when the corpus has outgrown its frozen
  * geometry, the flag must FIRE and the rebuild path must actually run
  * (fresh bucketed generation at the new pick); when the pick is
  * unchanged, nothing may be rewritten. Serve-through: pairs served
  * from the RELOADED rebanded table must equal pairs served from a
  * fresh full-count store.
  */
class LshRebandSpec extends SparkSpec {

  test("doubling fires the flag and the re-band bounds the candidate volume") {
    val row = SparkEntry.queries("vs_lsh_reband")(spark, sf).head()
    assert(row.getAs[Long]("reband_due") == 1L,
      "a corpus doubling must cross a tuned-geometry boundary")
    assert(row.getAs[Long]("r_new") > row.getAs[Long]("r_old"),
      "the re-pick must widen bands for a grown corpus")
    // the degraded state's collision volume is what the re-band exists
    // to bound: at the outgrown pick it must exceed the rebanded one's
    assert(row.getAs[Long]("cand_old") > row.getAs[Long]("cand_new"),
      s"re-band did not reduce candidate volume: " +
        s"${row.getAs[Long]("cand_old")} -> ${row.getAs[Long]("cand_new")}")
    info(s"geometry (${row.getAs[Long]("r_old")},${row.getAs[Long]("b_old")}) -> " +
      s"(${row.getAs[Long]("r_new")},${row.getAs[Long]("b_new")}), " +
      s"cand ${row.getAs[Long]("cand_old")} -> ${row.getAs[Long]("cand_new")}")
  }

  test("the rebuild path persists a fresh band_val-bucketed generation") {
    SparkEntry.queries("vs_lsh_reband")(spark, sf).collect()
    val t = VectorSearch.storedTable("graft_lsh_reband", sf)
    assert(spark.catalog.tableExists(t), s"$t was not written")
    assert(spark.catalog.listColumns(t).collect()
      .exists(c => c.name == "band_val" && c.isBucket),
      s"$t is not bucketed by band_val — the pair-join serving layout")
    val plan = spark.table(t).queryExecution.executedPlan.toString()
    assert(plan.contains("FileScan parquet"), s"not a FileScan:\n$plan")
  }

  test("serve-through: the reloaded rebanded table serves the same pairs as a fresh store") {
    // the re-pick at the full count IS the store-time pick, so the
    // rebanded generation must be content-equivalent to ensureLshStored's
    // band table: the full near-dup serve through either must agree.
    SparkEntry.queries("vs_lsh_reband")(spark, sf).collect()
    SparkEntry.queries("vs_lsh_store")(spark, sf).collect()
    val e = Tables.embeddings(spark, sf)
    def pairsVia(table: String): Set[(Long, Long)] = {
      val cand = graft.util.Skew.cappedSelfPairs(spark.table(table),
        "vec_id", Seq("band_idx", "band_val"), VectorSearch.LshBucketCap)
      cand
        .join(e.select(col("vec_id").as("a_id"), col("embedding").as("va")), "a_id")
        .join(e.select(col("vec_id").as("b_id"), col("embedding").as("vb")), "b_id")
        .filter(graft.functions.cosine_similarity(col("va"), col("vb")) >= 0.4)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val viaReband = pairsVia(VectorSearch.storedTable("graft_lsh_reband", sf))
    val viaStore = pairsVia(VectorSearch.storedTable("graft_lsh_bands", sf))
    assert(viaReband.nonEmpty && viaReband == viaStore,
      s"rebanded serve diverged from the fresh store: " +
        s"+${viaReband -- viaStore} -${viaStore -- viaReband}")
  }

  test("no-op arm: a saturated geometry table keeps the flag 0 and rewrites nothing") {
    val e = Tables.embeddings(spark, sf)
    val row = VectorSearch.lshRebandWith(spark, e, storeDir = None,
      geo = Seq((8, 13))).head()
    assert(row.getAs[Long]("reband_due") == 0L)
    assert(row.getAs[Long]("r_old") == row.getAs[Long]("r_new"))
    assert(row.getAs[Long]("rows_old") == row.getAs[Long]("rows_new") &&
      row.getAs[Long]("cand_old") == row.getAs[Long]("cand_new"),
      "no-op re-band must leave the table stats unchanged")
  }
}
