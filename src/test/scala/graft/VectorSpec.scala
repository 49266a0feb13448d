package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import graft.functions._

  test("kernels agree with hand-computed values") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      inner_product(col("a"), col("b")).as("ip"),
      l2_distance(col("a"), col("b")).as("l2"),
      cosine_similarity(col("a"), col("b")).as("cs"),
      vector_norm(col("a")).as("nm"),
      vector_normalize(col("a")).as("nz")).head()
    assert(r.getAs[Double]("ip") == 32.0)
    assert(math.abs(r.getAs[Double]("l2") - math.sqrt(27.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("cs") - 32.0 / math.sqrt(14.0 * 77.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("nm") - math.sqrt(14.0)) < 1e-12)
    val nz = r.getAs[scala.collection.Seq[Double]]("nz")
    assert(math.abs(nz.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("kernels survive whole-stage codegen and interpreted eval identically") {
    import spark.implicits._
    val df = Seq((Array(0.5f, -0.25f), Array(-1.0f, 2.0f))).toDF("a", "b")
    val gen = df.select(cosine_similarity(col("a"), col("b"))).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = df.select(cosine_similarity(col("a"), col("b"))).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(gen == interp)
  }

  test("poly_hash matches the reference formula") {
    import spark.implicits._
    val got = Seq("abc").toDF("s").select(poly_hash(col("s"))).head().getLong(0)
    val want = (("a".codePointAt(0) * 31L + 'b'.toLong) % 1000000007L * 31L + 'c'.toLong) % 1000000007L
    assert(got == want)
  }

  test("vs_search_topk returns at most 10 under-threshold neighbors, nearest first") {
    val rows = VectorSearch.vsSearchTopk(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val dists = rows.map(_.getAs[Double]("dist")).toSeq
    assert(dists == dists.sorted && dists.forall(_ < 0.6))
  }

  test("vs_knn_join returns exactly 5 neighbors per query") {
    val rows = VectorSearch.vsKnnJoin(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty && byQ.values.forall(_.length == 5))
  }

  test("vs_range_search pairs are deduped (a<b) and above threshold") {
    val rows = VectorSearch.vsRangeSearch(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
    assert(rows.forall(_.getAs[Double]("sim") >= 0.4))
  }

  test("vs_ingest emits one 64-dim vector checksum per document") {
    val rows = VectorSearch.vsIngest(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("dim") == 64L))
  }

  test("vs_ivf_search candidates are a subset of exact search space with k=5 per query") {
    val rows = VectorSearch.vsIvfSearch(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.values.forall(_.length <= 5))
  }

  test("vs_lsh_search finds only verified above-threshold pairs") {
    val rows = VectorSearch.vsLshSearch(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("sim") >= 0.4))
  }

  test("vs_hybrid_search ranks the query doc first with score 1.0") {
    val rows = VectorSearch.vsHybridSearch(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Long]("doc_id") == 0L)
    assert(rows.head.getAs[Double]("score") == 1.0)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sortBy(-_))
  }

  test("hash_count_vec folds hashes into the signed 64-slot count vector") {
    import spark.implicits._
    // h=0 → slot 0, +1 (0>>6 even); 64 → slot 0, −1; 65 → slot 1, −1;
    // 127 → slot 63, −1; 128 → slot 0, +1 (128>>6 = 2 even).
    val v = Seq(0L, 64L, 65L, 127L, 128L).toDF("h")
      .agg(hash_count_vec(col("h")).as("v")).head()
      .getAs[scala.collection.Seq[Long]]("v")
    assert(v.length == 64)
    assert(v(0) == 1L && v(1) == -1L && v(63) == -1L)
    assert((2 until 63).forall(i => v(i) == 0L))
  }

  test("hash_count_vec accepts negative hashes (general SQL function domain)") {
    import spark.implicits._
    // floorMod semantics: -1 → slot 63, floor(-1/64) = -1 odd → −1 vote.
    val v = Seq(-1L, -64L).toDF("h")
      .agg(hash_count_vec(col("h")).as("v")).head()
      .getAs[scala.collection.Seq[Long]]("v")
    assert(v(63) == -1L) // -1: slot 63, sign −1
    assert(v(0) == -1L)  // -64: slot 0, floor(-64/64) = -1 odd → −1
  }

  test("vs_quant_search: self-match first, ranking tracks the exact dot-product top-k") {
    val rows = VectorSearch.vsQuantSearch(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Long]("vec_id") == 0L) // self dot is maximal
    val qd = rows.map(_.getAs[Long]("qdot")).toSeq
    assert(qd == qd.sortBy(-_))
    // int8 quantization must preserve most of the exact dot-product
    // ranking: compare against the exact top-10 computed locally.
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val q = vecs(0L)
    val exactTop = vecs.toSeq
      .map { case (id, v) => (id, v.zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet
    val quantTop = rows.map(_.getAs[Long]("vec_id")).toSet
    assert((exactTop & quantTop).size >= 6,
      s"quantized ranking diverged: ${(exactTop & quantTop).size}/10 overlap")
  }

  test("vs_pq_search equals an independent Scala PQ/ADC implementation") {
    import VectorSearch.{PqM, PqDsub, PqK}
    // Reimplement the whole pipeline from raw floats in plain Scala:
    // quantize (round half-away-from-zero, Spark ROUND semantics),
    // codebook from the PqK smallest hash-coin ranks (r13 order-free
    // seed pick; codebook index = rank), per-subspace argmin encode
    // with first-min tie-break, ADC distance-table scoring.
    val raw = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .sortBy(_._1)
    val maxabs = raw.iterator.map(_._2.map(math.abs).max).max
    def qz(x: Double): Long = {
      val y = x * 127.0 / maxabs
      if (y >= 0) math.floor(y + 0.5).toLong else math.ceil(y - 0.5).toLong
    }
    val quant = raw.map { case (id, v) => id -> v.map(qz) }
    val seedIds = quant.map(_._1)
      .sortBy(id => (graft.util.Det.hashCoinLong(id), id)).take(PqK).toSeq
    // the order-free property itself: the pick is NOT the first PqK ids
    assert(seedIds != (0L until PqK.toLong).toSeq,
      s"hash-coin seed pick degenerated to first-$PqK ids: $seedIds")
    val byId = quant.toMap
    val seeds = seedIds.map(byId).toArray
    def subDist(a: Array[Long], b: Array[Long], m: Int): Long =
      (0 until PqDsub).map { d =>
        val diff = a(m * PqDsub + d) - b(m * PqDsub + d); diff * diff
      }.sum
    def encode(v: Array[Long]): Array[Int] =
      Array.tabulate(PqM) { m =>
        val ds = seeds.map(s => subDist(v, s, m))
        ds.indexOf(ds.min) // first min = lowest centroid id
      }
    val qv = quant.head._2 // query = vec 0 (quant sorted by id)
    val dtab = Array.tabulate(PqM, PqK)((m, c) => subDist(qv, seeds(c), m))
    val fullAdc = quant.map { case (id, v) =>
      val codes = encode(v)
      (id, codes.mkString(":"), codes.zipWithIndex.map { case (c, m) => dtab(m)(c) }.sum)
    }
    val expected = fullAdc
      .sortBy { case (id, _, adist) => (adist, id) }.take(10).toSeq
    val got = VectorSearch.vsPqSearch(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[String]("code"), r.getAs[Long]("adist")))
      .toSeq
    assert(got == expected)
    // the rank-0 seed always encodes to all-0 codes (first-min
    // tie-break cannot route a zero distance to a later rank)
    val code0 = fullAdc.find(_._1 == seedIds.head).get._2
    assert(code0 == Seq.fill(PqM)("0").mkString(":"),
      s"seed ${seedIds.head} (rank 0) encoded as $code0")
  }

  test("vs_pq_search plan: map-only encode, no corpus shuffle, no join on the corpus side") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val df = VectorSearch.vsPqSearch(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    // No KEY-based exchange anywhere: encode + ADC + top-k are map-side
    // (TakeOrdered reduction). The plan's only exchanges may be the
    // 1-row max-abs aggregate (SinglePartition over map-side partials)
    // and the test loader's round-robin fan-out of 1-row-group parquet.
    val keyed = nodes.collect {
      case s: ShuffleExchangeLike
        if s.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] ||
           s.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => s
    }
    assert(keyed.isEmpty,
      s"PQ scoring must not key-shuffle the corpus:\n${df.queryExecution.executedPlan}")
  }

  test("vs_ivfpq_search equals an independent Scala IVF+PQ/ADC implementation") {
    import VectorSearch.{PqM, PqDsub, PqK, IvfPqNprobe}
    val raw = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .sortBy(_._1)
    // r6 cosine distance, HALF_UP like Spark's round(x, 6)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      r6(1.0 - dot / math.sqrt(na * nb))
    }
    val cents = raw.take(8).map(_._2)
    def assign(v: Array[Double]): Int = {
      val ds = cents.map(c => cosDist(v, c))
      ds.indexOf(ds.min) // ties → lowest cid (struct least / row_number parity)
    }
    val assigned = raw.map { case (id, v) =>
      val cell = assign(v); (id, cell, v.zip(cents(cell)).map { case (a, b) => a - b })
    }
    val maxabs = assigned.iterator.map(_._3.map(math.abs).max).max
    def qz(x: Double): Long = {
      val y = x * 127.0 / maxabs
      if (y >= 0) math.floor(y + 0.5).toLong else math.ceil(y - 0.5).toLong
    }
    val quant = assigned.map { case (id, cell, r) => (id, cell, r.map(qz)) }
    // r13 order-free seed pick: PqK smallest hash-coin ranks over ids
    val seedIds = quant.map(_._1)
      .sortBy(id => (graft.util.Det.hashCoinLong(id), id)).take(PqK).toSeq
    val resById = quant.map(t => t._1 -> t._3).toMap
    val seeds = seedIds.map(resById).toArray
    def subDist(a: Array[Long], b: Array[Long], m: Int): Long =
      (0 until PqDsub).map { d =>
        val diff = a(m * PqDsub + d) - b(m * PqDsub + d); diff * diff
      }.sum
    def encode(v: Array[Long]): Array[Int] =
      Array.tabulate(PqM) { m =>
        val ds = seeds.map(s => subDist(v, s, m))
        ds.indexOf(ds.min)
      }
    // query = vec 0's ORIGINAL vector; probe its nprobe nearest cells
    val qv = raw.head._2
    val probeCells = cents.indices.map(c => (cosDist(qv, cents(c)), c))
      .sorted.take(IvfPqNprobe).map(_._2)
    val dtabByCell = probeCells.map { c =>
      val qres = qv.zip(cents(c)).map { case (a, b) => a - b }.map(qz)
      c -> Array.tabulate(PqM, PqK)((m, k) => subDist(qres, seeds(k), m))
    }.toMap
    val expected = quant.filter(t => probeCells.contains(t._2)).map { case (id, cell, r) =>
      val codes = encode(r)
      (id, cell.toLong, codes.mkString(":"),
        codes.zipWithIndex.map { case (c, m) => dtabByCell(cell)(m)(c) }.sum)
    }.sortBy { case (id, _, _, adist) => (adist, id) }.take(10).toSeq
    val got = VectorSearch.vsIvfPqSearch(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[String]("code"), r.getAs[Long]("adist")))
      .toSeq
    assert(got == expected)
  }

  test("vs_ivfpq_search plan: corpus path is map-only — no key shuffle, no corpus join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val df = VectorSearch.vsIvfPqSearch(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    val keyed = nodes.collect {
      case s: ShuffleExchangeLike
        if s.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] ||
           s.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => s
    }
    assert(keyed.isEmpty,
      s"IVF-PQ scoring must not key-shuffle the corpus:\n${df.queryExecution.executedPlan}")
  }

  test("vs_lsh_search pairs are a subset of vs_range_search pairs (recall check)") {
    def key(r: Row) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
    val exact = VectorSearch.vsRangeSearch(spark, sf).collect().map(key).toSet
    val lsh = VectorSearch.vsLshSearch(spark, sf).collect().map(key).toSet
    assert(lsh.subsetOf(exact))
  }
}
