package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: acc = (acc*31 + byte) mod 1e9+7.
  *
  * Backs the deterministic hashing-trick embedder (reference ingest path,
  * src/main.rs:53-80 `create_embedding` → INSERT) and document
  * fingerprinting. Pure integer arithmetic over the UTF-8 bytes, so the
  * DuckDB oracle reproduces it exactly with
  * `list_reduce(list_transform(range(1,len(t)+1), i -> unicode(t[i])),
  *              (a,b) -> (a*31+b) % 1000000007)` on ASCII tokens.
  * Codegen'd: one tight loop per row inside WholeStageCodegen.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "poly_hash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    PolyHash.hashBytes(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val Seq(i, b, acc) = Seq("i", "b", "acc").map(ctx.freshName)
      s"""
        |byte[] $b = $s.getBytes();
        |long $acc = 0L;
        |for (int $i = 0; $i < $b.length; $i++) {
        |  $acc = ($acc * 31L + (long)($b[$i] & 0xFF)) % 1000000007L;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object PolyHash {
  final val Mod = 1000000007L
  def hashBytes(b: Array[Byte]): Long = {
    var acc = 0L; var i = 0
    while (i < b.length) { acc = (acc * 31L + (b(i) & 0xFF).toLong) % Mod; i += 1 }
    acc
  }
  /** Codepoint variant — matches DuckDB `unicode()` folding on ANY
    * string (byte folding only matches for pure-ASCII input). */
  def hashCodepoints(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L; var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp.toLong) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Polynomial rolling hash over Unicode CODEPOINTS — use for char-gram
  * hashing of raw text, where the DuckDB oracle's `unicode(c[i])` sees
  * codepoints, not UTF-8 bytes. (For alnum tokens the byte variant
  * [[PolyHash]] is equivalent and cheaper.) */
case class PolyHashCp(child: Expression) extends UnaryExpression {
  override def prettyName: String = "poly_hash_cp"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(s: Any): Any =
    PolyHash.hashCodepoints(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHash.hashCodepoints($s);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
