package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor by tiling a source SF `copies`
  * times with shifted keys — for PERFORMANCE scaling probes only (no
  * correctness oracle runs against it).
  *
  *   sbt "runMain graft.tools.SynthScale /root/testdata/sf0.1 testdata_sf1 10"
  *
  * Key shifts preserve referential integrity per copy (copy i's orders
  * reference copy i's customers, etc.). Content columns are perturbed so
  * near-dup/similarity DENSITY stays constant instead of every copy
  * being a duplicate of copy 0 (which would grow pair outputs ~copies²
  * and measure input blowup, not plan scaling):
  *   - documents.text: letters get a copy-specific Caesar shift — within-
  *     copy near-dup structure is preserved exactly (a bijective char map
  *     preserves every gram/shingle equality), lengths and token shapes
  *     are unchanged, and cross-copy overlap drops to punctuation/digit
  *     background for BOTH word-shingle and char-gram blocking (a token
  *     suffix is not enough: suffixed tokens still share most char-3-grams,
  *     which made cross-copy twins collide in the ngram minhash bands and
  *     grew candidate pairs ~45× instead of 10×);
  *   - embeddings.embedding: coordinates rolled by i positions — norms
  *     and coordinate distributions unchanged, cross-copy cosine sims
  *     fall to background level.
  * events keep their time range (10× copies = 10× event density, the
  * realistic way an event stream grows); ts is normalized to BIGINT ns
  * on read (Tables.normalizeTs), so synth output is canonical whatever
  * parquet encoding the driver files carried.
  *
  * Skew mode (4th arg `skew`): plants realistic hot spots for stress
  * runs — ~1% of all events collapse onto ONE user_id and ~0.8% of all
  * embeddings become ONE identical vector (→ one LSH/IVF bucket far
  * above any cap) — while keeping every other distribution unchanged.
  */
object SynthScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val skew = args.lift(3).contains("skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, copies, skew)
    spark.stop()
  }

  /** The tiling body, callable from specs with a shared session.
    * `skewHotEvery`: 1 in N events lands on the hot user (default 100 =
    * the realistic ~1% whale; specs use a smaller N so the plant
    * dominates even a few-hundred-user sf0.001 corpus). */
  def run(spark: SparkSession, src: String, out: String, copies: Int,
      skew: Boolean, skewHotEvery: Long = 100L): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head().getLong(0) + 1
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[synth] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    def tiled(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => shift(df, i)).reduce(_ unionAll _)

    // Fixed dims copy through unchanged.
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    val cust = rd("customer"); val cMax = maxOf(cust, "c_custkey")
    val supp = rd("supplier"); val sMax = maxOf(supp, "s_suppkey")
    val part = rd("part"); val pMax = maxOf(part, "p_partkey")
    val ord = rd("orders"); val oMax = maxOf(ord, "o_orderkey")

    wr(tiled(cust)((d, i) => d.withColumn("c_custkey", col("c_custkey") + lit(i * cMax))),
      "customer")
    wr(tiled(supp)((d, i) => d.withColumn("s_suppkey", col("s_suppkey") + lit(i * sMax))),
      "supplier")
    wr(tiled(part)((d, i) => d.withColumn("p_partkey", col("p_partkey") + lit(i * pMax))),
      "part")
    wr(tiled(ord)((d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * oMax))
      .withColumn("o_custkey", col("o_custkey") + lit(i * cMax))), "orders")
    wr(tiled(rd("lineitem"))((d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * oMax))
      .withColumn("l_partkey", col("l_partkey") + lit(i * pMax))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * sMax))), "lineitem")

    // Whatever parquet encoding the source chose for ts, synth output
    // carries the canonical BIGINT ns (see Tables.normalizeTs).
    val ev = graft.Tables.normalizeTs(rd("events"))
    val eMax = maxOf(ev, "event_id"); val uMax = maxOf(ev, "user_id")
    val evTiled = tiled(ev)((d, i) => d
      .withColumn("event_id", col("event_id") + lit(i * eMax))
      .withColumn("user_id", col("user_id") + lit(i * uMax)))
    // Skew plant: 1 in 100 events (uniform over event_id, so spread over
    // all types/times) lands on ONE hot user — the realistic bot/whale
    // profile that breaks per-user groupBy/sessionization without salting.
    wr(if (skew) evTiled.withColumn("user_id",
        when(pmod(col("event_id"), lit(skewHotEvery)) === 0L, lit(uMax * copies + 1L))
          .otherwise(col("user_id")))
      else evTiled, "events")

    val docs = rd("documents"); val dMax = maxOf(docs, "doc_id")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    wr(tiled(docs)((d, i) => {
      val k = i % 26
      val txt = if (k == 0) col("text")
        else translate(col("text"),
          lower + upper,
          lower.drop(k) + lower.take(k) + upper.drop(k) + upper.take(k))
      d.withColumn("doc_id", col("doc_id") + lit(i * dMax))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    }), "documents")

    val emb = rd("embeddings"); val vMax = maxOf(emb, "vec_id")
    val embTiled = tiled(emb)((d, i) => {
      val roll = i % 64
      val rolled = if (roll == 0) col("embedding")
        else concat(slice(col("embedding"), roll + 1, 64 - roll),
          slice(col("embedding"), 1, roll))
      d.withColumn("vec_id", col("vec_id") + lit(i * vMax))
        .withColumn("embedding", rolled)
    })
    // Skew plant: 1 in 128 vectors becomes ONE identical embedding — all
    // of them share every LSH band bucket and IVF cell, putting that
    // bucket far above any self-pair cap (the crawler-duplicate profile).
    wr(if (skew) {
      val hot = emb.orderBy("vec_id").select("embedding").head()
        .getSeq[Float](0).toArray
      embTiled.withColumn("embedding",
        when(pmod(col("vec_id"), lit(128L)) === 0L,
          lit(hot)).otherwise(col("embedding")))
    } else embTiled, "embeddings")
  }

  /** HOSTILE plant (r14 verdict #3): same-size copy of `src` with the
    * three adversarial distributions every audit bound was NOT
    * calibrated on —
    *   - events: user_id remapped to a Zipf(1) popularity law via the
    *     inverse-CDF of the per-event hash coin (rank = ⌊U^u01⌋ — the
    *     head user absorbs ~1/ln(U) of ALL events, the long tail keeps
    *     U distinct users), and a HUB event_type (`hubShare`% of all
    *     events collapse onto 'view') so every transition / path / top-k
    *     aggregate sees one dominant edge;
    *   - documents: one MEGA-DUPLICATE family — every `megaDupEvery`-th
    *     doc becomes the SAME text (the crawler-mirror profile), putting
    *     one bucket in every content-blocking scheme (minhash band,
    *     simhash chunk, char-ngram band, phash band) at family-size² /2
    *     self-pairs unless the degenerate-bucket caps engage;
    *   - embeddings: every `hotVecEvery`-th vector becomes ONE identical
    *     vector (the skew-mode plant, denser).
    * Dims and relational tables copy through unchanged. For stress
    * sweeps and guard specs only — no oracle runs against it. */
  def hostile(spark: SparkSession, src: String, out: String,
      megaDupEvery: Long = 10L, hotVecEvery: Long = 64L,
      hubSharePct: Int = 80): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      wr(rd(t), t)

    val ev = graft.Tables.normalizeTs(rd("events"))
    val uMax = ev.agg(max("user_id").cast("long")).head().getLong(0).max(2L)
    // Zipf(1) inverse CDF: u01 uniform in [0,1) from the hash coin,
    // rank = floor(U^u01) ∈ [1, U] with p(rank=r) ∝ 1/r.
    val u01 = graft.util.Det.hashCoin(col("event_id")).cast("double") / 2147483648.0
    val zipfUser = floor(pow(lit(uMax.toDouble), u01)).cast("long")
    val hub = pmod(graft.util.Det.hashCoin(col("event_id") * 13L + 5L), lit(100L))
    wr(ev
      .withColumn("user_id", zipfUser)
      .withColumn("event_type",
        when(hub < hubSharePct, lit("view")).otherwise(col("event_type"))),
      "events")

    val docs = rd("documents")
    val mega = docs.orderBy("doc_id").select("text").head().getString(0)
    wr(docs
      .withColumn("text",
        when(pmod(col("doc_id"), lit(megaDupEvery)) === 0L, lit(mega))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    val emb = rd("embeddings")
    val hot = emb.orderBy("vec_id").select("embedding").head()
      .getSeq[Float](0).toArray
    wr(emb.withColumn("embedding",
      when(pmod(col("vec_id"), lit(hotVecEvery)) === 0L, lit(hot))
        .otherwise(col("embedding"))),
      "embeddings")
  }
}
