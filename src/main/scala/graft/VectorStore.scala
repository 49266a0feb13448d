package graft

import graft.functions._
import graft.util.Det._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Drop-in batch equivalent of the reference CLI's API surface
  * (aqora-io/vector_search_playground src/main.rs: Create / Count /
  * Search) as a Spark-native library class.
  *
  * A `VectorStore` wraps any DataFrame with an id column and an
  * `array<float|double>` vector column — the Spark analogue of the
  * reference's `search(id, content, vector)` pgvector table
  * (migration/src/m20250414_131949_create_search.rs).
  *
  *  - reference `Create content` (embed + INSERT, main.rs:53-80) →
  *    [[VectorStore.ingestText]]: batch embed a text DataFrame with the
  *    deterministic hashing-trick embedder and append.
  *  - reference `Count` (main.rs:82-85) → [[count]].
  *  - reference `Search query` (main.rs:86-96, cosine distance < 0.6,
  *    ORDER BY ASC LIMIT 10) → [[search]] with the same defaults.
  *
  * All search math runs in the codegen'd Catalyst kernels; the scan is
  * embarrassingly parallel and the top-k is a TakeOrderedAndProject —
  * no shuffle of the corpus at any scale.
  */
final class VectorStore(val df: DataFrame, idCol: String = "vec_id",
    vecCol: String = "embedding") {

  /** Reference `Count`. */
  def count(): Long = df.count()

  /** Reference `Create` onto a LIVE store (main.rs:72-80 INSERTs each
    * row into the existing table): embed the increment with the same
    * hashing-trick embedder and append it, so a subsequent [[search]] /
    * [[searchText]] sees old and new rows together. Batch analogue of
    * the reference's Create-then-Search loop.
    *
    * Contract (mirrors the reference, which INSERTs blindly into a
    * serial-keyed table): callers supply FRESH ids — appending an id
    * that already exists duplicates the row and search then returns
    * both copies. Columns beyond (id, content, vector) are dropped from
    * the base store by the projection below; keep side data outside the
    * store and re-join on the id column. */
  def appendText(docs: DataFrame, docIdCol: String, textCol: String): VectorStore = {
    val inc = VectorStore.ingestText(docs, docIdCol, textCol).df
      .select(col("vec_id").as(idCol), col("content"), col("embedding").as(vecCol))
    val base =
      if (df.columns.contains("content")) df
      else df.withColumn("content", lit(null).cast("string"))
    new VectorStore(
      base.select(col(idCol), col("content"), col(vecCol)).unionByName(inc),
      idCol, vecCol)
  }

  /** Reference `Search`: cosine-distance threshold top-k, nearest first,
    * ties broken by id. */
  def search(query: Seq[Float], k: Int = 10, threshold: Double = 0.6): DataFrame =
    searchVec(typedlit(query), k, threshold)

  /** Reference `Search <query>` end-to-end: embed the text client-side
    * (exactly like main.rs:86-90 embeds the query before the SQL) with
    * the same embedder as [[VectorStore.ingestText]], then search. */
  def searchText(query: String, k: Int = 10, threshold: Double = 0.6): DataFrame = {
    val q = VectorStore.embedTextLocal(query)
    require(q != null, s"query has no embeddable tokens: '$query'")
    searchVec(typedlit(q.toSeq), k, threshold)
  }

  private def searchVec(q: Column, k: Int, threshold: Double): DataFrame = {
    df.select(col(idCol), col(vecCol))
      .withColumn("dist", r6(lit(1.0) - cosine_similarity(col(vecCol), q)))
      .filter(col("dist") < threshold)
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Batch kNN for a whole query DataFrame (broadcast query side).
    * NULL distances (zero-norm vectors) rank last, as in SQL engines. */
  def searchAll(queries: DataFrame, qId: String, qVec: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc_nulls_last, col("c_id"))
    df.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(queries.select(col(qId).as("q_id"), col(qVec).as("qv"))))
      .select(col("q_id"), col("c_id"),
        r6(lit(1.0) - cosine_similarity(col("cv"), col("qv"))).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}

object VectorStore {
  final val Dim = 64

  /** Deterministic hashing-trick embedder (stands in for the reference's
    * fastembed AllMiniLM, main.rs:53-61 — no model weights in a
    * zero-egress build, see SURVEY §6): lowercase alnum tokens →
    * poly_hash → signed count at hash mod Dim, L2-normalized to
    * array<double>. Map-side only; codegen'd hash. */
  def embedText(text: Column): Column = {
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)
    // Hash each token ONCE, then fold the hash stream into the count
    // vector (one O(Dim) array update per token, no re-hashing per dim).
    val hashes = transform(toks, t => poly_hash(t))
    val counts = aggregate(hashes, array_repeat(lit(0L), Dim), (acc, h) =>
      zip_with(acc, sequence(lit(0), lit(Dim - 1)), (v, i) =>
        v + when(h % Dim === i,
          when(shiftright(h, 6) % 2 === 0, 1L).otherwise(-1L)).otherwise(0L)))
    vector_normalize(counts)
  }

  /** Driver-side twin of [[embedText]] for embedding a single query
    * string (the reference embeds the query in the client process too,
    * main.rs:86-90). Bit-identical to the distributed column version —
    * including null (not a zero vector) when the text has no tokens or
    * all signs cancel, mirroring vector_normalize's NULL on |a|=0. */
  def embedTextLocal(text: String): Array[Double] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val v = new Array[Double](Dim)
    toks.foreach { t =>
      val h = functions.PolyHash.hashBytes(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sign = if ((h >> 6) % 2 == 0) 1.0 else -1.0
      v((h % Dim).toInt) += sign
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) null else v.map(_ / n)
  }

  /** Reference `Create` path for a whole DataFrame: text → vector store
    * rows (id, content, vector). */
  def ingestText(docs: DataFrame, idCol: String, textCol: String): VectorStore = {
    val withVec = graft.util.Det.materializedColumn(docs, "embedding",
      embedText(col(textCol)))
      .select(col(idCol).as("vec_id"), col(textCol).as("content"), col("embedding"))
    new VectorStore(withVec, "vec_id", "embedding")
  }

  /** Open a store over the driver-generated embeddings table. */
  def fromParquet(spark: org.apache.spark.sql.SparkSession, dir: String): VectorStore =
    new VectorStore(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** Corpus-TRAINED embedder leg: MLlib Word2Vec (skip-gram) fitted on
    * the ingest corpus itself, doc vector = mean of in-vocabulary word
    * vectors (Word2VecModel.transform's own composition), L2-normalized
    * into the same (vec_id, content, embedding) store shape as
    * [[ingestText]] — proving the store API generalizes beyond the
    * hashing trick (the reference's fastembed model is learned too;
    * main.rs:53-61). Deterministic per environment: fixed seed, input
    * sorted by id, numPartitions=1 (parallel float SGD is NOT
    * bit-reproducible across partition counts — which is why this leg is
    * registered rows-only, SURVEY §6). Training cost is the corpus pass
    * × `maxIter`; at 100 TB you train on a sample and [[ingestTextW2v]]
    * only *applies* the model, which is a broadcast-vocabulary map-only
    * transform. `sampleMod` IS that posture, exercised: the model fits
    * on every `sampleMod`-th document (id-keyed — deterministic, no
    * RNG) and transforms the FULL corpus; numPartitions stays 1 on the
    * now-bounded training slice, so determinism survives while the
    * serial-SGD wall shrinks by the sample factor (measured at sf1,
    * 50k docs: full ingest 30.1 s vs 8.0 s at sampleMod=4, steady
    * back-to-back runs — the delta is entirely the fit stage; W2vSpec
    * proves planted-topic retrieval intact on a 1-in-4 sample). Zero-vocab docs (no token survives minCount) keep a NULL
    * vector, like [[embedText]]'s null on empty token streams. */
  def ingestTextW2v(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = Dim, seed: Long = 42L, minCount: Int = 2,
      maxIter: Int = 1, sampleMod: Long = 1L): VectorStore = {
    import org.apache.spark.ml.functions.vector_to_array
    val toks = w2vTokens(docs, idCol, textCol)
    val model = fitW2v(docs, idCol, textCol, dim, seed, minCount, maxIter, sampleMod)
    val out = model.transform(toks)
      .withColumn("embedding",
        vector_normalize(vector_to_array(col("w2v"), "float64")))
      .select(col("vec_id"), col("content"), col("embedding"))
    new VectorStore(out, "vec_id", "embedding")
  }

  /** The (vec_id, content, tokens) frame both the fit and the transform
    * read — ONE tokenization so the trained vocabulary and the frozen
    * transform key cannot drift apart. */
  private[graft] def w2vTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("vec_id"), col(textCol).as("content"))
      .withColumn("tokens",
        filter(split(lower(col("content")), "[^a-z0-9]+"), t => length(t) > 0))
      .orderBy("vec_id")

  /** The fitted model behind [[ingestTextW2v]], exposed so the
    * frozen-vocabulary transform key (`vs_ingest_w2v`) quantizes THE
    * SAME model the store leg serves — identical training slice, seed,
    * partitioning and tokenization. */
  private[graft] def fitW2v(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = Dim, seed: Long = 42L, minCount: Int = 2,
      maxIter: Int = 1, sampleMod: Long = 1L): org.apache.spark.ml.feature.Word2VecModel = {
    import org.apache.spark.ml.feature.Word2Vec
    val toks = w2vTokens(docs, idCol, textCol)
    val trainSlice =
      if (sampleMod <= 1L) toks else toks.filter(col("vec_id") % sampleMod === 0)
    new Word2Vec()
      .setInputCol("tokens").setOutputCol("w2v")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
      .setMaxIter(maxIter).setNumPartitions(1)
      .fit(trainSlice)
  }
}
