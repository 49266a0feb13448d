package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst vector kernels (single pass, whole-stage codegen).
  *
  * Re-expresses the reference's pgvector distance operator `<=>`
  * (reference: src/main.rs:86-96 `ORDER BY vector <=> $q LIMIT 10`) as
  * codegen'd Spark expressions over `array<float|double>` columns.
  *
  * Scale notes: each kernel is one fused loop over `ArrayData` with double
  * accumulators — no boxing, no UDF serialization, stays inside
  * WholeStageCodegen so a 100 TB scan×distance pipeline is CPU-bound on
  * the multiply-adds, not on row marshalling. Accumulation order is
  * strictly sequential (index 0..n-1) so results are bit-deterministic
  * and reproducible against the DuckDB oracle.
  */
object VectorKernel {
  /** Element read as double, for FloatType/DoubleType arrays (interpreted path). */
  private[functions] def get(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType   => arr.getLong(i).toDouble
    case other      => throw new IllegalArgumentException(s"unsupported vector element type $other")
  }
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def leftElem: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType = right.dataType.asInstanceOf[ArrayType].elementType
}

/** dot(a, b) — sequential double accumulation. */
case class InnerProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "inner_product"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    var dot = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { dot += VectorKernel.get(x, leftElem, i) * VectorKernel.get(y, rightElem, i); i += 1 }
    dot
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, dot) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("dot"))
      s"""
        |int $n = $a.numElements();
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += (double) ${CodeGenerator.getValue(a, leftElem, i)}
        |        * (double) ${CodeGenerator.getValue(b, rightElem, i)};
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** cosine_similarity(a, b) = dot / sqrt(|a|²·|b|²), one fused pass.
  * NULL when either norm is zero (undefined angle) — matching SQL
  * engines where division by zero yields NULL, so oracles agree. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      val va = VectorKernel.get(x, leftElem, i); val vb = VectorKernel.get(y, rightElem, i)
      dot += va * vb; na += va * va; nb += vb * vb; i += 1
    }
    if (na == 0.0 || nb == 0.0) null else dot / math.sqrt(na * nb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, dot, na, nb, va, vb) =
        Seq("i", "n", "dot", "na", "nb", "va", "vb").map(ctx.freshName)
      s"""
        |int $n = $a.numElements();
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $va = (double) ${CodeGenerator.getValue(a, leftElem, i)};
        |  double $vb = (double) ${CodeGenerator.getValue(b, rightElem, i)};
        |  $dot += $va * $vb; $na += $va * $va; $nb += $vb * $vb;
        |}
        |if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
        |else { ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb); }
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2_distance(a, b) = sqrt(Σ (aᵢ−bᵢ)²). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      val d = VectorKernel.get(x, leftElem, i) - VectorKernel.get(y, rightElem, i)
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, acc, d) = Seq("i", "n", "acc", "d").map(ctx.freshName)
      s"""
        |int $n = $a.numElements();
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $d = (double) ${CodeGenerator.getValue(a, leftElem, i)}
        |            - (double) ${CodeGenerator.getValue(b, rightElem, i)};
        |  $acc += $d * $d;
        |}
        |${ev.value} = java.lang.Math.sqrt($acc);
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l1_distance(a, b) = Σ |aᵢ−bᵢ| (Manhattan). */
case class L1Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l1_distance"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) {
      acc += math.abs(VectorKernel.get(x, leftElem, i) - VectorKernel.get(y, rightElem, i))
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, acc) = Seq("i", "n", "acc").map(ctx.freshName)
      s"""
        |int $n = $a.numElements();
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $acc += java.lang.Math.abs((double) ${CodeGenerator.getValue(a, leftElem, i)}
        |                           - (double) ${CodeGenerator.getValue(b, rightElem, i)});
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Integer kernels over quantized grids (array<long>/array<int>):
  * EXACT BIGINT accumulation — the oracle-replayable arithmetic the
  * int8-grid ops are built on. The `aggregate(zip_with(...))` spelling
  * of the same fold is a CodegenFallback higher-order function —
  * interpreted per-row eval plus an intermediate array allocation;
  * measured 5-8× slower on the NN-descent score step. Callers
  * guarantee bounded elements (int8 grid: |v| ≤ 127, so Σd² fits
  * BIGINT at any real dimension — same contract the HOF spelling had;
  * accumulation wraps Java-style, it is NOT ANSI-checked). */
abstract class IntVectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // Analysis-time type check (the r10 advice): a non-integer array used
  // to surface as an opaque ClassCastException at eval; now the plan
  // fails analysis with the kernel's name and the offending types.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if Seq(l, r).forall(t => t == LongType || t == IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two integer arrays (array<int>/array<long>), " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  protected def leftElem: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType = right.dataType.asInstanceOf[ArrayType].elementType
  protected def getLong(arr: ArrayData, et: DataType, i: Int): Long = et match {
    case LongType    => arr.getLong(i)
    case IntegerType => arr.getInt(i).toLong
    case other => throw new IllegalArgumentException(s"unsupported integer vector element $other")
  }
  /** Equal-length guard shared by both eval paths: the loops run over
    * the LEFT length, and codegen's getValue on a shorter right array
    * reads past UnsafeArrayData bounds — silent garbage, not an error
    * (the old aggregate/zip_with spelling null-padded instead). One
    * comparison per row; never throws on the grid pipelines, which
    * produce equal dims by construction. */
  protected def requireSameLen(x: ArrayData, y: ArrayData): Unit =
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector length mismatch ${x.numElements()} vs ${y.numElements()}")
  protected def lenGuardCode(a: String, b: String): String =
    s"""if ($a.numElements() != $b.numElements())
       |  throw new IllegalArgumentException("$prettyName: vector length mismatch "
       |    + $a.numElements() + " vs " + $b.numElements());""".stripMargin
}

/** int_sq_l2(a, b) = Σ (aᵢ−bᵢ)² as BIGINT — exact squared L2. */
case class IntSquaredL2(left: Expression, right: Expression) extends IntVectorBinaryExpression {
  override def prettyName: String = "int_sq_l2"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    requireSameLen(x, y)
    var acc = 0L; var i = 0; val n = x.numElements()
    while (i < n) {
      val d = getLong(x, leftElem, i) - getLong(y, rightElem, i)
      acc += d * d; i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, acc, d) = Seq("i", "n", "acc", "d").map(ctx.freshName)
      s"""
        |${lenGuardCode(a, b)}
        |int $n = $a.numElements();
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  long $d = (long) ${CodeGenerator.getValue(a, leftElem, i)}
        |          - (long) ${CodeGenerator.getValue(b, rightElem, i)};
        |  $acc += $d * $d;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** int_dot(a, b) = Σ aᵢ·bᵢ as BIGINT — exact integer inner product. */
case class IntDot(left: Expression, right: Expression) extends IntVectorBinaryExpression {
  override def prettyName: String = "int_dot"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    requireSameLen(x, y)
    var acc = 0L; var i = 0; val n = x.numElements()
    while (i < n) { acc += getLong(x, leftElem, i) * getLong(y, rightElem, i); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, acc) = Seq("i", "n", "acc").map(ctx.freshName)
      s"""
        |${lenGuardCode(a, b)}
        |int $n = $a.numElements();
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  $acc += (long) ${CodeGenerator.getValue(a, leftElem, i)}
        |        * (long) ${CodeGenerator.getValue(b, rightElem, i)};
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** vector_norm(a) = sqrt(Σ aᵢ²). */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vector_norm"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { val v = VectorKernel.get(x, elem, i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(i, n, acc, v) = Seq("i", "n", "acc", "v").map(ctx.freshName)
      s"""
        |int $n = $a.numElements();
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $v = (double) ${CodeGenerator.getValue(a, elem, i)};
        |  $acc += $v * $v;
        |}
        |${ev.value} = java.lang.Math.sqrt($acc);
      """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** vector_normalize(a) = a / |a| as array<double>; NULL when |a| = 0
  * (matching SQL division-by-zero → NULL so oracles agree). */
case class VectorNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vector_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val v = VectorKernel.get(x, elem, i); acc += v * v; i += 1 }
    val norm = math.sqrt(acc)
    if (norm == 0.0) null
    else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = VectorKernel.get(x, elem, i) / norm; i += 1 }
      new GenericArrayData(out)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(i, n, acc, v, out, norm) = Seq("i", "n", "acc", "v", "out", "norm").map(ctx.freshName)
      s"""
        |int $n = $a.numElements();
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $v = (double) ${CodeGenerator.getValue(a, elem, i)};
        |  $acc += $v * $v;
        |}
        |double $norm = java.lang.Math.sqrt($acc);
        |if ($norm == 0.0) { ${ev.isNull} = true; }
        |else {
        |  double[] $out = new double[$n];
        |  for (int $i = 0; $i < $n; $i++) {
        |    $out[$i] = ((double) ${CodeGenerator.getValue(a, elem, i)}) / $norm;
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |}
      """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ALL random-hyperplane LSH band values in ONE fused pass (r12): for
  * each of `bands`·`planesPerBand` planes, the sign of the plane dot
  * product becomes one bit, and each band folds its `planesPerBand`
  * bits MSB-first into a long key — bit-identically to the previous
  * spelling (`transform(planesLit, p -> inner_product(v, p) >= 0)` +
  * per-band `aggregate(slice(...))`), which was a CodegenFallback
  * higher-order function evaluated per PLANE per row: at the adaptive
  * tuned geometry's 5,943 planes the interpretation overhead made
  * vs_lsh_tuned the slowest query in the sf1 sweep (20.5 s). Here the
  * whole signature is one JIT/codegen primitive loop over a flat
  * `double[]` plane matrix (shipped once per stage via
  * addReferenceObj, same bytes the literal carried before).
  * Accumulation order per plane is index 0..n-1 like [[InnerProduct]],
  * so the DuckDB oracle's per-plane list_inner_product sign replay is
  * unchanged. */
case class LshBandVals(child: Expression, planesFlat: Array[Double],
    dims: Int, planesPerBand: Int, bands: Int)
    extends UnaryExpression {
  require(planesFlat.length == dims * planesPerBand * bands,
    s"plane matrix ${planesFlat.length} != $dims*$planesPerBand*$bands")
  override def prettyName: String = "lsh_band_vals"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  private def elem = child.dataType.asInstanceOf[ArrayType].elementType
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dims)
    val out = new Array[Long](bands)
    var j = 0; var b = 0
    while (b < bands) {
      var acc = 0L; var s = 0
      while (s < planesPerBand) {
        var dot = 0.0; var i = 0; val base = j * dims
        while (i < n) {
          dot += VectorKernel.get(x, elem, i) * planesFlat(base + i); i += 1
        }
        acc = acc * 2 + (if (dot >= 0) 1L else 0L)
        s += 1; j += 1
      }
      out(b) = acc; b += 1
    }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("lshPlanes", planesFlat, "double[]")
      val Seq(n, out, j, b, acc, s, dot, i, base) =
        Seq("n", "out", "j", "b", "acc", "s", "dot", "i", "base").map(ctx.freshName)
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $dims);
        |long[] $out = new long[$bands];
        |int $j = 0;
        |for (int $b = 0; $b < $bands; $b++) {
        |  long $acc = 0L;
        |  for (int $s = 0; $s < $planesPerBand; $s++, $j++) {
        |    double $dot = 0.0;
        |    int $base = $j * $dims;
        |    for (int $i = 0; $i < $n; $i++) {
        |      $dot += (double) ${CodeGenerator.getValue(a, elem, i)} * $planes[$base + $i];
        |    }
        |    $acc = $acc * 2 + ($dot >= 0 ? 1L : 0L);
        |  }
        |  $out[$b] = $acc;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
