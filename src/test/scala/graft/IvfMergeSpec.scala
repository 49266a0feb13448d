package graft

import graft.ops.{IvfIndex, VectorSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF segment merge (`vs_ivf_merge`): recall floor at every SF,
  * consolidation accounting, and the load-bearing claim — dropping the
  * fresh segment's reassignment collapses recall, so the merge is what
  * keeps the consolidated index serving the whole corpus.
  */
class IvfMergeSpec extends SparkSpec {

  test("vs_ivf_merge clears the recall floor at sf0.001 / sf0.01 / sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("vs_ivf_merge")(spark, dir).collect()
      assert(rows.length == 8, s"$dir: expected one row per base cell")
      info(s"$dir mean_recall_ppm=${rows.head.getAs[Long]("mean_recall_ppm")}")
      assert(rows.forall(_.getAs[Long]("below_floor") == 0L),
        s"$dir: merged serve under floor ${VectorSearch.IvfDeleteRecallFloorPpm}")
    }
  }

  test("consolidation accounting: the merged index holds exactly the union") {
    val rows = SparkEntry.queries("vs_ivf_merge")(spark, sf).collect()
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val nFresh = e.filter(col("vec_id") % 3 === 0).count()
    assert(rows.map(_.getAs[Long]("n_merged")).sum == n)
    assert(rows.map(_.getAs[Long]("n_fresh")).sum == nFresh)
    for (r <- rows)
      assert(r.getAs[Long]("n_merged") ==
        r.getAs[Long]("n_base") + r.getAs[Long]("n_fresh"))
    assert(nFresh > 0 && rows.map(_.getAs[Long]("n_fresh")).sum > 0)
  }

  test("the reassignment is load-bearing: base-only serving grades strictly worse") {
    // Same probe + rerank with the fresh segment's assignment DROPPED:
    // a third of every exact top-5 can never be served, so recall must
    // fall strictly below the merged grade.
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val mx = e.agg(max(array_max(transform(col("embedding"), x => abs(x)))).as("maxabs"))
    val qAll = e.crossJoin(broadcast(mx)).select(col("vec_id"),
      transform(col("embedding"), x =>
        round(x * lit(127.0) / col("maxabs"), 0).cast("long")).as("q"))
    val qb = qAll.filter(col("vec_id") % 3 =!= 0)
    val model = IvfIndex.fitInt(qb, "vec_id", "q", k = 8, iters = 2)
    def assign(src: DataFrame) = src.select(col("vec_id").as("c_id"),
      IvfIndex.intCellOf(col("q"), model).as("cell"))
    val probeStructs = model.centroids.map { case (cid, cv) =>
      struct(IvfIndex.intD2(col("qq"), cv).as("d2"), lit(cid).as("cid")) }
    val probes = qAll.filter(col("vec_id") % 100 === 3)
      .select(col("vec_id").as("q_id"), col("q").as("qq"))
      .select(col("q_id"), explode(slice(array_sort(array(probeStructs: _*)),
        1, VectorSearch.IvfTrainedNprobe)).as("p"))
      .select(col("q_id"), col("p.cid").as("cell"))
    val qraw = e.filter(col("vec_id") % 100 === 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc_nulls_last, col("c_id"))
    def dist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(lit(1.0) - graft.functions.cosine_similarity(a, b), 6)
    val exact = e.crossJoin(broadcast(qraw))
      .select(col("q_id"), col("vec_id").as("c_id"),
        dist(col("embedding"), col("qv")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "c_id")
    def ppm(assigned: DataFrame): Long = {
      val approx = assigned.join(broadcast(probes), "cell")
        .join(e.withColumnRenamed("vec_id", "c_id"), "c_id")
        .join(broadcast(qraw), "q_id")
        .select(col("q_id"), col("c_id"), dist(col("embedding"), col("qv")).as("dist"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("q_id", "c_id")
      val t = exact.join(approx.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))), count(lit(1))).head()
      1000000L * t.getLong(0) / t.getLong(1)
    }
    val merged = ppm(assign(qb).unionByName(assign(qAll.filter(col("vec_id") % 3 === 0))))
    val baseOnly = ppm(assign(qb))
    info(s"merged=$merged base-only=$baseOnly")
    assert(baseOnly < merged, "dropping the fresh segment did not hurt recall")
  }
}
