package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extension point: register graft's native functions at session
  * build time, the standard deployment for a Spark-native library:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * After that, every kernel in [[graft.functions.kernelBuilders]] —
  * `cosine_similarity`, `l2_distance`, `inner_product`, `int_sq_l2`,
  * `int_dot`, `vector_norm`, `vector_normalize`, `poly_hash`,
  * `sorted_intersect_count`, the heap/sketch aggregates (`kth_min`,
  * `kmv_kth_min`, `minhash_sig`, `simhash_chunks`, `misra_gries`,
  * `hash_count_vec`), … — works in SQL text, `expr(...)`, and
  * higher-order-function lambdas on every session. The list is THE
  * shared registry (r14): this class and
  * [[graft.functions.register]] iterate the same sequence, so the two
  * registration surfaces cannot drift apart.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.kernelBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}
