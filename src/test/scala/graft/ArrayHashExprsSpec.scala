package graft

import org.apache.spark.sql.functions._

import graft.functions.{ArrayHashExprs, Hashing}
import graft.operators.Dedup

/** Native codegen'd sketch expressions must agree bit-for-bit with the
  * declarative HOF compositions they replace, on real fixture text.
  */
class ArrayHashExprsSpec extends SparkSuite {

  private lazy val hashed = {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("xs", transform(Dedup.shingles(col("text")),
        g => Hashing.baseHash60(g)))
  }

  test("native simhash == declarative simhash on fixture docs") {
    val diff = hashed.select(
      ArrayHashExprs.simhash_bits(col("xs"), Dedup.SimhashBits).as("native"),
      Dedup.simhashDeclarative(col("xs")).as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(diff == 0L)
  }

  test("native minhash == declarative minhash on fixture docs") {
    val diff = hashed.select(
      ArrayHashExprs.minhash_sig(col("xs"), 16).as("native"),
      Dedup.minhashSigDeclarative(col("xs"), 16).as("decl"))
      .filter(to_json(col("native")) =!= to_json(col("decl"))).count()
    assert(diff == 0L)
  }

  test("minhash of empty array is null; simhash of empty array is 0") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq.empty[Long]).toDF("xs")
    val r = df.select(
      ArrayHashExprs.minhash_sig(col("xs"), 4).as("mh"),
      ArrayHashExprs.simhash_bits(col("xs"), 32).as("sh")).collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
  }
}
