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

  /** Reference `Search`: cosine-distance threshold top-k, nearest first,
    * ties broken by id. */
  def search(query: Seq[Float], k: Int = 10, threshold: Double = 0.6): DataFrame = {
    df.select(col(idCol), col(vecCol))
      .withColumn("dist", r6(lit(1.0) - cosine_similarity(col(vecCol), typedlit(query))))
      .filter(col("dist") < threshold)
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Batch kNN for a whole query DataFrame (broadcast query side). */
  def searchAll(queries: DataFrame, qId: String, qVec: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("c_id"))
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
    val counts = transform(sequence(lit(0), lit(Dim - 1)), i =>
      aggregate(toks, lit(0L), (acc, t) => {
        val h = PolyHashCol(t)
        acc + when(h % Dim === i,
          when(shiftright(h, 6) % 2 === 0, 1L).otherwise(-1L)).otherwise(0L)
      }))
    vector_normalize(counts)
  }
  private def PolyHashCol(c: Column): Column = poly_hash(c)

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
}
