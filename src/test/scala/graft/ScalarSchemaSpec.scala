package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, MapType, StructType, StructField}

/** The driver's correctness harness hashes query outputs with pandas
  * (sort_values → factorize), which dies on array/map/struct cells —
  * r15 shipped its only red row (`vs_ingest_w2v`) exactly this way: the
  * key was semantically green but emitted a raw `array<bigint>` column
  * the driver could not hash, and the local checker masked it by
  * stringifying non-scalar cells. This spec closes the CLASS: no
  * registered query may emit a non-scalar top-level column, ever.
  * (tools/check.py now also fails loudly on non-scalar cells, so the
  * gate holds on both sides of the JVM boundary.)
  */
class ScalarSchemaSpec extends SparkSpec {

  private def nonScalar(schema: StructType): Seq[String] =
    schema.fields.collect {
      case StructField(n, _: ArrayType, _, _)  => s"$n: array"
      case StructField(n, _: MapType, _, _)    => s"$n: map"
      case StructField(n, _: StructType, _, _) => s"$n: struct"
    }.toSeq

  test("the detector itself red-flags an array-emitting frame") {
    import org.apache.spark.sql.functions._
    val bad: DataFrame = spark.range(3)
      .select(col("id"), array(lit(1L), lit(2L)).as("v"),
        map(lit("k"), lit(1)).as("m"), struct(lit(1).as("a")).as("s"))
    assert(nonScalar(bad.schema) == Seq("v: array", "m: map", "s: struct"))
    assert(nonScalar(spark.range(1).schema).isEmpty)
  }

  test("no registered query emits a top-level array/map/struct column") {
    // Constructing every frame at sf0.001 also exercises each op's
    // plan-time side effects (index builds, stores) — acceptable here,
    // the suite's other specs pay the same memoized cost.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = nonScalar(fn(spark, sf).schema)
        if (bad.nonEmpty) Some(s"$name -> ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      "driver-unhashable output schemas:\n  " + offenders.mkString("\n  "))
  }
}
