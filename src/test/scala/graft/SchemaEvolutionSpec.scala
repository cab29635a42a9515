package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaEvolution
import graft.sources.SchemaEvolution.Change

/** The schema gate: every change class with its breaking verdict,
  * nested paths, the safe-widening list both ways, and the
  * footer-level table diff.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  import SparkTestBase._

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("price", IntegerType, nullable = true),
    StructField("tag", StringType, nullable = true),
    StructField("ratio", FloatType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("src", StringType, nullable = false),
      StructField("v", IntegerType, nullable = true))), nullable = true),
    StructField("xs", ArrayType(IntegerType), nullable = true)))

  private val v2 = StructType(Seq(
    StructField("id", LongType, nullable = true),      // loosened
    StructField("price", LongType, nullable = true),   // safe widening
    // tag dropped
    StructField("ratio", StringType, nullable = true), // breaking retype
    StructField("meta", StructType(Seq(
      StructField("src", StringType, nullable = false),
      StructField("v", DoubleType, nullable = true),   // nested widening
      StructField("note", StringType, nullable = true))), // nested add
      nullable = true),
    StructField("xs", ArrayType(LongType), nullable = true), // element retype
    StructField("must", StringType, nullable = false))) // required add

  test("every change class is reported with the right verdict") {
    val got = SchemaEvolution.diff(v1, v2)
      .map(c => (c.kind, c.path, c.breaking)).toSet
    assert(got === Set(
      ("added", "meta.note", false),
      ("added", "must", true),
      ("dropped", "tag", true),
      ("retyped", "price", false),        // int -> long widens
      ("retyped", "ratio", true),         // float -> string breaks
      ("retyped", "meta.v", false),       // int -> double widens
      ("retyped", "xs", true),            // array element int -> long is
                                          // NOT on the reader-safe list
      ("nullable-loosened", "id", true)))
    assert(!SchemaEvolution.backwardCompatible(v1, v2))
  }

  test("identity and benign evolution are compatible") {
    assert(SchemaEvolution.diff(v1, v1).isEmpty)
    val benign = StructType(v1.fields :+
      StructField("extra", StringType, nullable = true))
    assert(SchemaEvolution.backwardCompatible(v1, benign))
    // tightening nullability is reader-safe
    val tightened = StructType(v1.fields.map {
      case f if f.name == "price" => f.copy(nullable = false)
      case f => f
    })
    assert(SchemaEvolution.backwardCompatible(v1, tightened))
  }

  test("widenings are directional") {
    def one(a: DataType, b: DataType): Change =
      SchemaEvolution.diff(
        StructType(Seq(StructField("c", a))),
        StructType(Seq(StructField("c", b)))).head
    assert(!one(IntegerType, LongType).breaking)
    assert(one(LongType, IntegerType).breaking)   // narrowing breaks
    assert(!one(FloatType, DoubleType).breaking)
    assert(one(DoubleType, FloatType).breaking)
    assert(!one(DecimalType(10, 2), DecimalType(18, 2)).breaking)
    assert(one(DecimalType(18, 2), DecimalType(10, 2)).breaking)
    assert(one(DecimalType(10, 2), DecimalType(18, 4)).breaking) // scale
  }

  test("diffTables reads only footers and spots a live change") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-schema").toString
    val base = graft.sources.Tables.customer(spark, sf0001)
      .select("c_custkey", "c_mktsegment")
    base.write.parquet(s"$dir/v1")
    base.withColumnRenamed("c_mktsegment", "segment")
      .write.parquet(s"$dir/v2")
    val got = SchemaEvolution.diffTables(spark, s"$dir/v1", s"$dir/v2")
      .map(c => (c.kind, c.path)).toSet
    assert(got === Set(("dropped", "c_mktsegment"), ("added", "segment")))
  }
}
