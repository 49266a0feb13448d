package graft

import graft.ops.{Events, Graph, Lake, Pipeline, Relational, TextAnalysis, VectorSearch}
import org.apache.spark.sql.functions._

/** Behavior specs for the round-5 second widening batch (trigram paths,
  * HLL sketch, stratified sampling, CUBE, triangle listing, schema
  * evolution, prefix search). Each test checks the operator against an
  * INDEPENDENT computation path — plain-Scala brute force on collected
  * sf0.001 data, a conservation law, or a different DataFrame
  * decomposition — never the operator's own SQL oracle.
  */
class ExtraOpsSpec extends SparkSpec {

  private val HashMod = 1000000007L
  private def poly(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c) % HashMod)

  test("ev_top_paths equals brute-force trigram mining on collected events") {
    val rows = Events.evTopPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.length == 3).map(w => ((w(0), w(1), w(2)), u)).toSeq
    }
    val n = paths.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nUsers = paths.distinct.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val want = n.toSeq.sortBy { case ((a, b, c), cnt) => (-cnt, a, b, c) }.take(10)
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (r, (path, cnt)) =>
      assert((r.getString(0), r.getString(1), r.getString(2)) == path)
      assert(r.getAs[Long]("n") == cnt)
      assert(r.getAs[Long]("n_users") == nUsers(path))
    }
  }

  test("text_collocations equals brute-force integer-lift ranking") {
    val rows = TextAnalysis.textCollocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val toks = Tables.documents(spark, sf).select("text").collect()
      .map(r => "[a-z0-9]+".r.findAllIn(r.getString(0).toLowerCase).toSeq)
      .filter(_.length >= 2)
    val uni = toks.flatten.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val n = uni.values.sum
    val bg = toks.flatMap(ts => ts.zip(ts.tail)).groupBy(identity)
      .map { case (p, v) => p -> v.size.toLong }.filter(_._2 >= TextAnalysis.CollocMinCount)
    val want = bg.toSeq.map { case ((w1, w2), cab) =>
      // the operator's exact IEEE op order: (cab·n·1e6) / (c1·c2)
      val lift = cab.toDouble * n.toDouble * TextAnalysis.CollocScale.toDouble /
        (uni(w1).toDouble * uni(w2).toDouble)
      (w1, w2, cab, uni(w1), uni(w2), lift)
    }.sortBy { case (w1, w2, _, _, _, lift) => (-lift, w1, w2) }.take(20)
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (r, (w1, w2, cab, c1, c2, lift)) =>
      assert((r.getString(0), r.getString(1)) == (w1, w2))
      assert(r.getAs[Long]("cab") == cab && r.getAs[Long]("c1") == c1 &&
        r.getAs[Long]("c2") == c2)
      assert(math.abs(r.getAs[Double]("lift_micro") - lift) < 1e-6 * math.max(1.0, lift))
    }
  }

  test("text_hll_sketch registers match brute force and the estimate is within HLL error") {
    val rows = TextAnalysis.textHllSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase)
        .map(t => (r.getString(0), t)))
    val bySource = toks.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val hs = bySource(src).map(t => (poly(t._2) * 2654435761L) % HashMod).distinct
      assert(r.getAs[Long]("n_exact") == hs.length.toLong)
      // registers re-derived independently: bucket = hs%32, rho = 26-bitlen(hs/32)
      val regs = hs.groupBy(_ % 32).map { case (b, v) =>
        b -> v.map { h =>
          val w = h / 32
          if (w == 0L) 26L else 26L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        }.max
      }
      val nz = regs.values.map(r0 => 1L << (26 - r0)).sum
      val regSum = nz + (32L - regs.size) * (1L << 26)
      assert(r.getAs[Long]("n_present") == regs.size.toLong)
      assert(r.getAs[Long]("reg_sum") == regSum)
      val est = (697L * (1L << 36)) / (1000L * regSum)
      assert(r.getAs[Long]("hll_est") == est)
      // m=32 → standard error ≈ 1.04/√32 ≈ 18%; assert a loose 3σ envelope
      val exact = hs.length.toDouble
      assert(est > exact * 0.45 && est < exact * 1.8,
        s"$src: HLL estimate $est too far from exact $exact")
    }
  }

  test("pipeline_stratified_sample: exactly K per stratum, matching brute-force hash order") {
    val rows = Pipeline.pipelineStratifiedSample(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map { case (id, _) => (id, (poly(s"$src:$id") * 2654435761L) % HashMod) }
        .sortBy { case (id, coin) => (coin, id) }.take(Pipeline.StratK)
        .zipWithIndex.map { case ((id, _), i) => (src, i + 1L, id) }
    }.sortBy(t => (t._1, t._2))
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (r, (src, rn, id)) =>
      assert(r.getAs[String]("source") == src)
      assert(r.getAs[Long]("rn") == rn)
      assert(r.getAs[Long]("doc_id") == id)
    }
    // every stratum with ≥ K docs contributes exactly K
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val got = rows.count(_.getAs[String]("source") == src)
      assert(got == math.min(ds.length, Pipeline.StratK))
    }
  }

  test("q17_cube: gid slices are consistent (details sum to marginals and total)") {
    val rows = Relational.q17Cube(spark, sf).collect()
    def slice(g: Long) = rows.filter(_.getAs[Long]("gid") == g)
    val detail = slice(0L)
    val total = slice(3L)
    assert(total.length == 1)
    assert(detail.map(_.getAs[Long]("n")).sum == total.head.getAs[Long]("n"))
    assert(detail.map(_.getAs[Long]("sum_c")).sum == total.head.getAs[Long]("sum_c"))
    // marginal over priority (gid=1: status kept, priority rolled up)
    val byStatus = detail.groupBy(_.getAs[String]("o_orderstatus"))
      .map { case (k, v) => k -> (v.map(_.getAs[Long]("n")).sum, v.map(_.getAs[Long]("sum_c")).sum) }
    slice(1L).foreach { r =>
      val (n, s) = byStatus(r.getAs[String]("o_orderstatus"))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("sum_c") == s)
    }
    val byPriority = detail.groupBy(_.getAs[String]("o_orderpriority"))
      .map { case (k, v) => k -> (v.map(_.getAs[Long]("n")).sum, v.map(_.getAs[Long]("sum_c")).sum) }
    slice(2L).foreach { r =>
      val (n, s) = byPriority(r.getAs[String]("o_orderpriority"))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("sum_c") == s)
    }
    assert(slice(1L).nonEmpty && slice(2L).nonEmpty)
  }

  test("graph_triangles equals brute-force enumeration over the undirected edge set") {
    val tris = Graph.graphTriangles(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val und = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2)
        .filter(_.length == 2)
        .map(w => if (w(0) <= w(1)) (w(0), w(1)) else (w(1), w(0))).toSeq
    }.filter(e => e._1 != e._2).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val want = for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      x = nodes(i); y = nodes(j); z = nodes(k)
      if und((x, y)) && und((y, z)) && und((x, z))
    } yield (x, y, z)
    assert(tris.toSeq == want.toSeq)
    assert(tris.nonEmpty, "test graph should contain at least one triangle")
  }

  test("pipeline_pack: distributed prefix-sum equals the sequential concat-and-chunk") {
    val rows = Pipeline.pipelinePack(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).size.toLong))
      .sortBy(_._1)
    // sequential reference: running offset in doc_id order
    var off = 0L
    val packed = docs.map { case (_, t) =>
      val p = off / Pipeline.PackCap
      val crosses = if (t > 0 && (off + t - 1) / Pipeline.PackCap != p) 1L else 0L
      off += t
      (p, t, crosses)
    }
    val want = packed.groupBy(_._1).map { case (p, vs) =>
      p -> (vs.length.toLong, vs.map(_._2).sum, vs.map(_._3).sum)
    }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (nDocs, nToks, nCross) = want(r.getAs[Long]("pack_id"))
      assert(r.getAs[Long]("n_docs") == nDocs && r.getAs[Long]("n_tokens") == nToks &&
        r.getAs[Long]("n_crossing") == nCross, s"pack ${r.getAs[Long]("pack_id")}")
    }
    // conservation: every doc lands in exactly one pack
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == docs.map(_._2).sum)
  }

  test("vs_knn_classify equals brute-force 5-NN majority vote") {
    val rows = VectorSearch.vsKnnClassify(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2).toLong))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val results = emb.filter(_._1 % 50 == 0).map { case (qid, qv, trueLabel) =>
      val nn = emb.toSeq.filter(_._1 != qid)
        .map { case (id, v, l) =>
          (id, l, BigDecimal(1.0 - cos(v, qv)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
        .sortBy { case (id, _, d) => (d, id) }.take(5)
      val pred = nn.groupBy(_._2).map { case (l, vs) => (l, vs.size) }
        .toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      (trueLabel, pred)
    }
    val want = results.groupBy(_._1).map { case (l, vs) =>
      l -> (vs.length.toLong, vs.count(v => v._2 == v._1).toLong)
    }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (nEval, nCorrect) = want(r.getAs[Long]("label"))
      assert(r.getAs[Long]("n_eval") == nEval && r.getAs[Long]("n_correct") == nCorrect,
        s"label ${r.getAs[Long]("label")}")
    }
  }

  test("ev_user_features: per-type counts partition each user's events; totals conserve") {
    val rows = Events.evUserFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val typeSum = Events.EvTypes.map(t => r.getAs[Long](s"n_$t")).sum
      assert(typeSum == r.getAs[Long]("n_events"),
        s"user ${r.getAs[Long]("user_id")}: type counts must partition events")
      assert(r.getAs[Long]("n_days") >= 1L &&
        r.getAs[Long]("n_days") <= r.getAs[Long]("n_events"))
    }
    val ev = Tables.events(spark, sf)
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(rows.length.toLong == ev.select("user_id").distinct().count())
  }

  test("ev_heavy_hitters equals the exact GROUP BY / HAVING answer") {
    val rows = Events.evHeavyHitters(spark, sf).collect()
    val n = Tables.events(spark, sf).count()
    val want = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .filter(_.getAs[Long]("count") * (Events.MgK + 1) > n)
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    assert(rows.nonEmpty && rows.length == want.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") == want(r.getAs[String]("event_type")))
      assert(r.getAs[Long]("n_total") == n)
    }
  }

  test("misra_gries guarantee holds on a planted skewed stream under forced merges") {
    import spark.implicits._
    // key 7 = 30% of rows; 1400 unique filler keys overflow any k=4 map
    val data = (Seq.fill(600)(7L) ++ (0 until 1400).map(i => 1000L + i.toLong))
      .toDF("k").repartition(8)
    val cands = data.agg(graft.functions.misra_gries(col("k"), 4).as("c"))
      .head.getSeq[Long](0)
    assert(cands.length <= 4)
    // frequency 30% > n/(k+1) = 20% → guaranteed candidate
    assert(cands.contains(7L), s"heavy key missing from candidates: $cands")
  }

  test("lake_zorder: every bucket bounds BOTH dimensions; buckets partition the events") {
    val rows = graft.ops.Lake.lakeZorder(spark, sf).collect()
    assert(rows.nonEmpty)
    val uSpan = rows.map(_.getAs[Long]("u_hi")).max - rows.map(_.getAs[Long]("u_lo")).min
    val hSpan = rows.map(_.getAs[Long]("h_hi")).max - rows.map(_.getAs[Long]("h_lo")).min
    rows.foreach { r =>
      // top-3-bits-per-dimension grid: each bucket's raw span ≤ ~1/8 of
      // the global range (assert 1/4 for scaling-floor slack)
      assert(r.getAs[Long]("u_hi") - r.getAs[Long]("u_lo") <= uSpan / 4 + 1,
        s"bucket ${r.getAs[Long]("zbucket")} user span too wide")
      assert(r.getAs[Long]("h_hi") - r.getAs[Long]("h_lo") <= hSpan / 4 + 1,
        s"bucket ${r.getAs[Long]("zbucket")} hour span too wide")
    }
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count())
    assert(rows.length > 1 && rows.length <= graft.ops.Lake.ZBuckets)
  }

  test("lake_schema_evolution: old rows NULL the new column, values otherwise intact") {
    val rows = Lake.lakeSchemaEvolution(spark, sf).collect()
    val nation = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name", "n_regionkey").collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows.length == nation.size)
    rows.foreach { r =>
      val k = r.getInt(0)
      assert(r.getString(1) == nation(k)._1)
      if (k < 13) assert(r.isNullAt(2), s"pre-migration row $k must be NULL")
      else assert(r.getInt(2) == nation(k)._2)
    }
  }

  test("vs_outliers equals brute-force centroid + farthest-3 ranking") {
    val rows = VectorSearch.vsOutliers(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2).toLong))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; for (i <- a.indices) d += a(i) * b(i); d
    }
    val want = emb.groupBy(_._3).toSeq.flatMap { case (label, vs) =>
      val sorted = vs.sortBy(_._1)
      // id-sorted sequential fold then per-element /n — the operator's
      // exact IEEE op order
      val sum = sorted.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      val c = sum.map(_ / vs.length)
      sorted.toSeq.map { case (id, v, _) =>
        val d = BigDecimal(1.0 - dot(v, c) / math.sqrt(dot(v, v) * dot(c, c)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        (label, id, d)
      }.sortBy { case (_, id, d) => (-d, id) }.take(3)
        .zipWithIndex.map { case ((l, id, d), i) => (l, i + 1L, id, d.toDouble) }
    }.sortBy(t => (t._1, t._2))
    assert(rows.length == want.length && rows.nonEmpty)
    rows.zip(want).foreach { case (r, (l, rank, id, d)) =>
      assert(r.getAs[Long]("label") == l && r.getAs[Long]("rank") == rank)
      assert(r.getAs[Long]("vec_id") == id, s"label $l rank $rank")
      assert(math.abs(r.getAs[Double]("dist") - d) < 1e-9)
    }
  }

  test("vs_mips_search equals brute-force inner-product ranking; augmented cosine agrees") {
    val rows = VectorSearch.vsMipsSearch(spark, sf).collect()
    assert(rows.length == 10)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val qv = emb.find(_._1 == 0L).get._2
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; for (i <- a.indices) d += a(i) * b(i); d
    }
    val want = emb.toSeq.map { case (id, v) => (id, dot(v, qv)) }
      .sortBy { case (id, ip) => (-ip, id) }.take(10).map(_._1)
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == want)
    // the augmented-cosine column must rank identically to the raw inner
    // product (the whole point of the norm-augmentation reduction)
    val cos = rows.map(_.getAs[Double]("cos_aug"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
      s"augmented cosine not monotone with inner product: ${cos.toSeq}")
  }

  test("vs_prefix_search equals the brute-force prefix-screen + exact rerank") {
    val rows = VectorSearch.vsPrefixSearch(spark, sf).collect()
    assert(rows.length == 10)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val qv = emb.find(_._1 == 0L).get._2
    def dot(a: Array[Double], b: Array[Double], n: Int): Double = {
      var d = 0.0; for (i <- 0 until n) d += a(i) * b(i); d
    }
    val cand = emb.toSeq
      .map { case (id, v) => (id, v, dot(v, qv, VectorSearch.PrefixDims)) }
      .sortBy { case (id, _, p) => (-p, id) }.take(64)
    val want = cand.map { case (id, v, _) =>
      val cos = dot(v, qv, v.length) / math.sqrt(dot(v, v, v.length) * dot(qv, qv, qv.length))
      (id, BigDecimal(1.0 - cos).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == want)
  }
}
