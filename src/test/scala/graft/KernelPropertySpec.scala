package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Property-style tests: the codegen'd kernels must agree with plain
  * Scala reference implementations on many pseudo-random vectors
  * (fixed seed — deterministic). */
class KernelPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def randVec(): Array[Float] = {
    val n = 1 + rnd.nextInt(16)
    Array.fill(n)(rnd.nextFloat() * 200f - 100f)
  }

  test("kernels match sequential reference implementations on arbitrary vectors") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val a = randVec()
      val b = a.map(x => x * 0.5f - 1.0f)
      val r = Seq((a, b)).toDF("a", "b").select(
        inner_product(col("a"), col("b")),
        l2_distance(col("a"), col("b")),
        l1_distance(col("a"), col("b")),
        cosine_similarity(col("a"), col("b")),
        vector_norm(col("a"))).head()
      var dot = 0.0; var na = 0.0; var nb = 0.0; var sq = 0.0; var ab = 0.0
      a.indices.foreach { i =>
        val (x, y) = (a(i).toDouble, b(i).toDouble)
        dot += x * y; na += x * x; nb += y * y
        val d = x - y; sq += d * d; ab += math.abs(d)
      }
      assert(r.getDouble(0) == dot)
      assert(r.getDouble(1) == math.sqrt(sq))
      assert(r.getDouble(2) == ab)
      assert(r.getDouble(3) == dot / math.sqrt(na * nb))
      assert(r.getDouble(4) == math.sqrt(na))
    }
  }

  test("vector_normalize yields unit vectors") {
    import spark.implicits._
    (1 to 10).foreach { _ =>
      val a = randVec()
      val n = Seq(Tuple1(a)).toDF("a")
        .select(vector_norm(vector_normalize(col("a")))).head().getDouble(0)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("zero-norm vectors yield NULL (not NaN) from cosine and normalize") {
    import spark.implicits._
    val r = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("z", "v").select(
      cosine_similarity(col("z"), col("v")),
      vector_normalize(col("z")),
      cosine_similarity(col("v"), col("v"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("kth_min aggregates the k-th smallest with bounded state across partitions") {
    import spark.implicits._
    val df = spark.range(1000).select((col("id") * 7919 % 1000).as("v")).repartition(8)
    val got = df.agg(kth_min(col("v"), 10)).head().getLong(0)
    assert(got == 9L) // values are a permutation of 0..999
    val tooFew = spark.range(5).agg(kth_min(col("id"), 10)).head()
    assert(tooFew.isNullAt(0))
  }

  test("kmv_kth_min is duplicate-insensitive: raw stream == distinct pre-pass, any partitioning") {
    // heavy duplication: each value 0..199 appears 1-25 times, shuffled
    // across 8 partitions — the deduping heap must emit exactly the
    // k-th smallest DISTINCT value, equal to kth_min over a distinct'd
    // input, for k below and above the distinct cardinality
    val df = spark.range(2600)
      .select((col("id") % 200).as("v"))
      .repartition(8)
    for (k <- Seq(10, 64, 199)) {
      val dup = df.agg(graft.functions.kmv_kth_min(col("v"), k)).head().getLong(0)
      val ded = df.distinct().agg(kth_min(col("v"), k)).head().getLong(0)
      assert(dup == ded && dup == (k - 1).toLong, s"k=$k: $dup vs $ded")
    }
    // below-k: 200 distinct values, k=500 -> null on both
    assert(df.agg(graft.functions.kmv_kth_min(col("v"), 500)).head().isNullAt(0))
  }

  test("misra_gries guarantee holds on random skewed streams across random partitionings") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val r = new scala.util.Random(1000 + trial)
      val k = 2 + r.nextInt(6)              // sketch size 2..7
      val nHeavy = 1 + r.nextInt(2)         // 1-2 planted heavy keys
      val n = 500 + r.nextInt(1500)
      // each heavy key must exceed total/(k+1) where total includes the
      // heavy keys themselves: heavyCount·(k+1−nHeavy) > n suffices
      val heavyCount = n / (k + 1 - nHeavy) + 1 + r.nextInt(20)
      val heavy = (1 to nHeavy).map(i => -i.toLong)
      val rows = heavy.flatMap(h => Seq.fill(heavyCount)(h)) ++
        (0 until n).map(_ => r.nextInt(10000).toLong) // noisy tail
      val total = rows.length.toLong
      val cands = rows.toDF("v").repartition(1 + r.nextInt(12))
        .agg(graft.functions.misra_gries(col("v"), k).as("c"))
        .head.getSeq[Long](0)
      assert(cands.length <= k, s"trial $trial: ${cands.length} > k=$k")
      heavy.foreach { h =>
        // exact frequency may exceed heavyCount if the tail collides
        // (it can't — tail keys are non-negative); guarantee applies
        assert(heavyCount.toLong > total / (k + 1),
          s"trial $trial: planted key not actually heavy")
        assert(cands.contains(h),
          s"trial $trial: heavy key $h (count $heavyCount of $total, k=$k) missing from $cands")
      }
    }
  }

  test("poly_hash_cp equals poly_hash on ASCII but folds codepoints on non-ASCII") {
    import spark.implicits._
    val r = Seq(("abc", "café")).toDF("a", "u").select(
      poly_hash(col("a")), poly_hash_cp(col("a")),
      poly_hash(col("u")), poly_hash_cp(col("u"))).head()
    assert(r.getLong(0) == r.getLong(1)) // ASCII: byte == codepoint folding
    assert(r.getLong(2) != r.getLong(3)) // é: 2 UTF-8 bytes vs 1 codepoint
    val cafeCp = Seq('c', 'a', 'f').map(_.toLong).foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    assert(r.getLong(3) == (cafeCp * 31 + 0xe9L) % 1000000007L)
  }

  test("poly_hash stays in [0, 1e9+7) and distributes across cells") {
    import spark.implicits._
    val words = (0 until 1000).map(i => s"tok$i")
    val hs = words.toDF("w").select(poly_hash(col("w")).as("h"))
      .select(col("h"), (col("h") % 64).as("cell")).collect()
    assert(hs.forall(r => r.getAs[Long]("h") >= 0 && r.getAs[Long]("h") < 1000000007L))
    val cells = hs.map(_.getAs[Long]("cell")).distinct
    assert(cells.length > 48) // all-but-a-few of 64 cells hit by 1000 tokens
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      val r = Seq((a, b)).toDF("a", "b").select(
        sorted_intersect_count(col("a"), col("b")),
        size(array_intersect(col("a"), col("b"))).cast("long")).head()
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("int_sq_l2/int_dot: equal-length parity with the HOF spelling") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(32)
      val a = Array.fill(n)((rnd.nextInt(255) - 127).toLong)
      val b = Array.fill(n)((rnd.nextInt(255) - 127).toLong)
      val r = Seq((a, b)).toDF("a", "b").select(
        graft.functions.int_sq_l2(col("a"), col("b")),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v),
        graft.functions.int_dot(col("a"), col("b")),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v)).head()
      assert(r.getLong(0) == r.getLong(1)); assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("int kernels fail LOUDLY on length mismatch and non-integer arrays") {
    import spark.implicits._
    // Length mismatch: the loops run over the left length, and codegen
    // getValue past the right array's end is silent garbage without the
    // guard — so the guard must throw, with the kernel's name.
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.int_sq_l2(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
    // Non-integer arrays: analysis-time failure naming the kernel, not
    // an eval-time ClassCastException.
    val fd = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val e2 = intercept[Exception] {
      fd.select(graft.functions.int_dot(col("a"), col("b"))).collect()
    }
    assert(e2.getMessage.contains("int_dot") ||
      e2.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("top_k_min_pairs (plain + distinct) match a reference top-k on adversarial streams") {
    // Guards the r17 insert reorder (worst-bound rejection before the
    // distinct scan): many pseudo-random streams with heavy duplicate
    // pressure, including duplicates equal to the current worst (the
    // case the bound now rejects before the scan) and duplicates of
    // better-ranked pairs (the case only the scan can catch), across
    // several partitionings so merge() paths are exercised too.
    import spark.implicits._
    val r = new scala.util.Random(7)
    (1 to 12).foreach { trial =>
      val k = 1 + r.nextInt(6)
      val n = 30 + r.nextInt(120)
      // small value domain => many exact (d, id) duplicates
      val pairs = Seq.fill(n)((r.nextInt(8).toLong, r.nextInt(10).toLong))
      val df = pairs.toDF("d", "id").repartition(1 + trial % 4)
      def ref(distinct: Boolean): Seq[(Long, Long)] = {
        val base = if (distinct) pairs.distinct else pairs
        base.sorted.take(k)
      }
      def got(c: org.apache.spark.sql.Column): Seq[(Long, Long)] =
        df.agg(c.as("top"))
          .select(explode(col("top")).as("h"))
          .select(col("h.d2"), col("h.c_id"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got(top_k_min_pairs(col("d"), col("id"), k)) == ref(distinct = false),
        s"plain cut diverged (trial $trial, k=$k)")
      assert(got(top_k_min_pairs_distinct(col("d"), col("id"), k)) == ref(distinct = true),
        s"distinct cut diverged (trial $trial, k=$k)")
    }
  }

  test("Det.hashCoinLong mirrors the hashCoin Column on a dense id range") {
    import spark.implicits._
    val ids = (0L until 5000L) ++ Seq(1000003L, 2147483646L, Long.MaxValue / 31 - 7)
    val got = ids.toDF("id")
      .select(col("id"), graft.util.Det.hashCoin(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == graft.util.Det.hashCoinLong(id),
        s"hashCoin mismatch at id=$id: column=${got(id)} long=${graft.util.Det.hashCoinLong(id)}")
    }
  }
}
