package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge

/** Column-level facade over graft's native Catalyst expressions. */
package object functions {
  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  def cosine_similarity(a: Column, b: Column): Column = col(CosineSimilarity(expr(a), expr(b)))
  /** pgvector `<=>` (reference src/main.rs:90): 1 − cosine similarity. */
  def cosine_distance(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.lit(1.0) - cosine_similarity(a, b)
  def l2_distance(a: Column, b: Column): Column = col(L2Distance(expr(a), expr(b)))
  def inner_product(a: Column, b: Column): Column = col(InnerProduct(expr(a), expr(b)))
  def vector_norm(a: Column): Column = col(VectorNorm(expr(a)))
  def vector_normalize(a: Column): Column = col(VectorNormalize(expr(a)))
  def poly_hash(s: Column): Column = col(PolyHash(expr(s)))
}
