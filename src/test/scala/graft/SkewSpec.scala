package graft

import graft.util.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedAgg gives identical results to a direct aggregation") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(graft.util.Det.cents(col("value"))).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(ev, Seq(col("event_type")), 16, col("event_id"),
        Seq(count(lit(1)).as("n"), sum(graft.util.Det.cents(col("value"))).as("s")),
        Seq(sum("n").as("n"), sum("s").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin gives identical results to a direct join") {
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val direct = ord.join(cust, "o_custkey").count()
    val salted = Skew.saltedJoin(ord, cust, "o_custkey", 8, col("o_orderkey")).count()
    assert(salted == direct)
  }

  test("cappedSelfPairs drops only over-cap buckets and pairs the rest exactly") {
    import spark.implicits._
    // bucket (0,10): 6 ids — over cap 4, must emit NO pairs.
    // bucket (0,20): 3 ids — C(3,2)=3 pairs. bucket (1,10): 2 ids — 1 pair.
    // id 99 shares no bucket — no pairs.
    val bands = (
      (1L to 6L).map(i => (0, 10L, i)) ++
      Seq((0, 20L, 7L), (0, 20L, 8L), (0, 20L, 9L)) ++
      Seq((1, 10L, 7L), (1, 10L, 9L)) ++
      Seq((1, 30L, 99L))
    ).toDF("band_idx", "band_val", "vec_id")
    val got = Skew.cappedSelfPairs(bands, "vec_id", Seq("band_idx", "band_val"), cap = 4)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(got == Set((7L, 8L), (7L, 9L), (8L, 9L)))
  }

  test("cappedSelfPairs with an unreachable cap equals the plain bucketed self-join") {
    // The registered LSH queries rely on exactly this equivalence for
    // oracle parity at test scale: LshBucketCap is far above any bucket
    // the corpus can produce, so capping must be a no-op.
    // sf0.01: enough vectors that band buckets actually collide (the
    // nonEmpty guard below keeps the equivalence non-vacuous).
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01").select("vec_id", "embedding")
    val bands = ops.VectorSearch.lshBands(e, "vec_id", "embedding")
    val plain = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Skew.cappedSelfPairs(bands, "vec_id", Seq("band_idx", "band_val"),
        ops.VectorSearch.LshBucketCap)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(capped == plain && capped.nonEmpty)
  }
}
