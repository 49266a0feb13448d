package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension point: register graft's native functions at session
  * build time, the standard deployment for a Spark-native library:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * After that, `cosine_similarity`, `l2_distance`, `inner_product`,
  * `vector_norm`, `vector_normalize`, `poly_hash`,
  * `sorted_intersect_count` work in SQL text, `expr(...)`, and
  * higher-order-function lambdas on every session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def fn(ext: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft", name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    import graft.functions._
    fn(ext, "cosine_similarity", es => CosineSimilarity(es(0), es(1)))
    fn(ext, "inner_product", es => InnerProduct(es(0), es(1)))
    fn(ext, "l2_distance", es => L2Distance(es(0), es(1)))
    fn(ext, "l1_distance", es => L1Distance(es(0), es(1)))
    fn(ext, "vector_norm", es => VectorNorm(es.head))
    fn(ext, "vector_normalize", es => VectorNormalize(es.head))
    fn(ext, "poly_hash", es => PolyHash(es.head))
    fn(ext, "poly_hash_cp", es => PolyHashCp(es.head))
    fn(ext, "sorted_intersect_count", es => SortedIntersectCount(es(0), es(1)))
    fn(ext, "kth_min", es => {
      require(es.length == 2 && es(1).foldable, "kth_min(col, k) needs a literal k")
      KthMin(es(0), es(1).eval().asInstanceOf[Number].intValue())
    })
    fn(ext, "kmv_kth_min", es => {
      require(es.length == 2 && es(1).foldable, "kmv_kth_min(col, k) needs a literal k")
      KthMinDistinct(es(0), es(1).eval().asInstanceOf[Number].intValue())
    })
    fn(ext, "simhash_chunks", es => SimhashChunks(es.head))
    fn(ext, "hash_count_vec", es => HashCountVec(es.head))
    fn(ext, "minhash_sig", es => {
      require(es.length == 2 && es(1).foldable, "minhash_sig(col, k) needs a literal k")
      MinhashSig(es(0), es(1).eval().asInstanceOf[Number].intValue())
    })
  }
}
