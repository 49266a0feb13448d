package graft

import org.apache.spark.sql.functions._

/** The corpus-trained Word2Vec embedder leg ([[VectorStore.ingestTextW2v]]):
  * the store API must generalize beyond the hashing trick — a LEARNED
  * embedding trained on the ingest corpus, searched through the same
  * `VectorStore.searchAll`, must place planted same-topic documents
  * nearer than cross-topic ones. Also pins the registered rows-only
  * query's structural output.
  */
class W2vSpec extends SparkSpec {
  import spark.implicits._

  /** Two disjoint-vocabulary topics, repeated sentences so skip-gram
    * co-occurrence has signal even on a tiny corpus. */
  private def plantedDocs = {
    val animal = "cat dog pet fur paw tail kitten puppy leash collar"
    val market = "stock bond yield trade price index broker margin equity fund"
    def doc(topic: String, i: Int): String = {
      val words = topic.split(" ")
      // rotate so each doc is a different sentence over the same vocab
      (0 until 6).map(s => words.drop((i + s) % words.length) ++
        words.take((i + s) % words.length)).flatten.mkString(" ")
    }
    ((0L until 10L).map(i => (i, doc(animal, i.toInt))) ++
      (10L until 20L).map(i => (i, doc(market, i.toInt - 10))))
      .toDF("doc_id", "text")
  }

  test("w2v store: same-topic docs rank above cross-topic on planted corpus") {
    val store = VectorStore.ingestTextW2v(plantedDocs, "doc_id", "text",
      dim = 16, seed = 7L, minCount = 1, maxIter = 2)
    val queries = store.df.filter(col("vec_id").isin(0L, 10L))
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val top = store.searchAll(queries, "q_id", "qv", k = 10)
      .select("q_id", "c_id", "rn").collect()
    // for each query, ALL top-10 hits must come from the query's own
    // topic block (ids 0-9 vs 10-19) — w2v trained on co-occurrence
    // must separate two disjoint vocabularies.
    for (r <- top) {
      val (q, c) = (r.getLong(0), r.getLong(1))
      assert((q < 10) == (c < 10),
        s"query $q retrieved cross-topic doc $c in its top-10")
    }
    assert(top.count(_.getLong(0) == 0L) == 10)
  }

  test("w2v embeddings are unit-norm and trained per corpus vocabulary") {
    val store = VectorStore.ingestTextW2v(plantedDocs, "doc_id", "text",
      dim = 16, seed = 7L, minCount = 1, maxIter = 2)
    val norms = store.df
      .select(sqrt(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x)))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9, s"norm $n"))
  }

  test("sample-train posture: 1-in-4 training slice keeps topic retrieval") {
    // The 100 TB posture: fit on every-4th doc (ids 0,4,8,... — both
    // topics sampled), transform ALL docs. Retrieval quality must
    // survive: every query's top-10 stays within its own topic block.
    val store = VectorStore.ingestTextW2v(plantedDocs, "doc_id", "text",
      dim = 16, seed = 7L, minCount = 1, maxIter = 2, sampleMod = 4L)
    assert(store.df.filter(col("embedding").isNotNull).count() == 20L,
      "transform must cover the FULL corpus, not just the training slice")
    val queries = store.df.filter(col("vec_id").isin(0L, 10L))
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val top = store.searchAll(queries, "q_id", "qv", k = 10)
      .select("q_id", "c_id").collect()
    for (r <- top) {
      val (q, c) = (r.getLong(0), r.getLong(1))
      assert((q < 10) == (c < 10),
        s"sample-trained query $q retrieved cross-topic doc $c")
    }
  }

  test("vs_ingest_w2v frozen transform: one row per doc, fingerprints consistent, vocab hit") {
    val df = SparkEntry.queries("vs_ingest_w2v")(spark, sf)
    val out = df.collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    // The registered key emits SCALAR fingerprints only (the driver's
    // pandas hasher can't hash array cells — r15 verdict #1). Replay
    // norm2 = Σ dvec² and wsum = Σ (i+1)·dvec[i] in plain Scala from
    // the chain's own doc-vector frame, plus the zero sentinel.
    val dvecs = ops.VectorSearch.w2vDocFrame(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("dvec"))).toMap
    for (r <- out) {
      val id = r.getLong(0)
      val nTerms = r.getAs[Long]("n_terms")
      val dvec = dvecs(id)
      assert(dvec.length == VectorStore.Dim)
      assert(r.getAs[Long]("norm2") == dvec.map(x => x * x).sum)
      assert(r.getAs[Long]("wsum") ==
        dvec.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum, s"doc $id wsum")
      if (nTerms == 0L) assert(dvec.forall(_ == 0L), s"zero-vocab doc $id")
    }
    // no array/map/struct column may reach the registered output
    assert(df.schema.fields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _: org.apache.spark.sql.types.StructType => false
      case _ => true
    }), "vs_ingest_w2v output must be all-scalar")
    // the synthetic corpus has a dense shared vocabulary: every doc
    // should hit the frozen top-256 vocab
    assert(out.forall(_.getAs[Long]("n_terms") > 0L))
    // and the frozen-vocab oracle entry must be present after the run
    assert(ops.VectorSearch.oracles.contains("vs_ingest_w2v"),
      "w2v oracle entry missing after the key ran")
  }

  test("the freeze's premise: two independent fits produce identical vocabulary vectors") {
    // The oracle literal is generated from the SAME memo the query read,
    // so within-run consistency never depends on refit stability — but
    // the determinism claim (fixed seed, sorted single-partition input)
    // should hold on its own. Pin it: two fresh fits, identical vectors.
    def vecs() = VectorStore.fitW2v(plantedDocs, "doc_id", "text",
        dim = 16, seed = 7L, minCount = 1, maxIter = 2).getVectors
      .select(col("word"),
        org.apache.spark.ml.functions.vector_to_array(col("vector")).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    val a = vecs()
    val b = vecs()
    assert(a.nonEmpty && a == b, "refit produced different vocabulary vectors")
  }
}
