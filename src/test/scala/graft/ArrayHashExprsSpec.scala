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

  test("fused shingle hasher == declarative shingles + poly hash on fixture docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      ArrayHashExprs.shingle_hashes(
        graft.functions.TextFunctions.normText(col("text")), 3).as("fused"),
      array_distinct(transform(Dedup.shingles(col("text"), 3),
        g => ArrayHashExprs.poly_hash31(g))).as("decl"))
      .filter(to_json(array_sort(col("fused"))) =!= to_json(array_sort(col("decl"))))
      .count()
    assert(diff == 0L)
  }

  test("fused shingle hasher handles short and empty texts") {
    val s = spark
    import s.implicits._
    val df = Seq("one two", "").toDF("t")
    val rows = df.select(ArrayHashExprs.shingle_hashes(col("t"), 3).as("xs"))
      .collect()
    // short text: whole string as one shingle
    def ph(str: String) = str.getBytes("UTF-8")
      .foldLeft(0L)((h, b) => (h * 1000003L + (b & 0xff)) % 2147483647L)
    assert(rows(0).getSeq[Long](0) == Seq(ph("one two")))
    assert(rows(1).getSeq[Long](0) == Seq(0L))
  }

  test("native unit_vector == declarative sqrt(dot)+transform on fixture vecs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val native = graft.operators.Similarity.withUnit(emb)
      .select(col("vec_id"), col("unit"))
    val decl = graft.operators.Similarity.withUnitDeclarative(emb)
      .select(col("vec_id"), col("unit").cast("array<double>").as("unit"))
    val diff = native.as("n").join(decl.as("d"), Seq("vec_id"))
      .filter(to_json(col("n.unit")) =!= to_json(col("d.unit"))).count()
    assert(diff == 0L)
  }

  test("unit_vector: zero vector maps to zeros, not NaN") {
    val s = spark
    import s.implicits._
    val r = Seq(Seq(0.0, 0.0, 0.0), Seq(3.0, 4.0, 0.0)).toDF("v")
      .select(ArrayHashExprs.unit_vector(col("v")).as("u")).collect()
    assert(r(0).getSeq[Double](0) == Seq(0.0, 0.0, 0.0))
    assert(r(1).getSeq[Double](0) == Seq(0.6, 0.8, 0.0))
  }

  test("array_no_nulls / array_has_nonzero == the exists() HOFs they replace") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("a", ArrayType(DoubleType))))
    val rows = Seq(
      Row(1L, Seq(1.0, 2.0)),            // clean
      Row(2L, Seq(0.0, 0.0)),            // all-zero
      Row(3L, Seq(1.0, null, 2.0)),      // element null
      Row(4L, Seq.empty[Double]),        // empty
      Row(5L, null),                     // whole null
      Row(6L, Seq(null, null)))          // all-null elements
    val d = spark.createDataFrame(rows.asJava, schema)
    val diff = d.select(col("id"),
      ArrayHashExprs.array_no_nulls(col("a")).as("nn"),
      (!exists(col("a"), x => x.isNull)).as("nn_hof"),
      ArrayHashExprs.array_has_nonzero(col("a")).as("nz"),
      exists(col("a"), x => x.isNotNull && x =!= 0.0).as("nz_hof"))
      .filter(!(col("nn") <=> col("nn_hof")) ||
        !(col("nz") <=> col("nz_hof")))
      .collect()
    assert(diff.isEmpty, s"codegen guards diverge from HOFs: ${diff.toSeq}")
    // the truth table itself, pinned (null input → null)
    val got = d.select(col("id"),
      ArrayHashExprs.array_no_nulls(col("a")).as("nn"),
      ArrayHashExprs.array_has_nonzero(col("a")).as("nz"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getBoolean(1),
         if (r.isNullAt(2)) null else r.getBoolean(2))).toMap
    assert(got(1L) == ((true, true)) && got(2L) == ((true, false)) &&
      got(3L) == ((false, true)) && got(4L) == ((true, false)) &&
      got(5L) == ((null, null)) && got(6L) == ((false, false)), got.toString)
  }

  test("bloom_hits == the size(filter(mightContain)) HOF it replaces") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val d0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // a real sketch over some of the corpus's own shingles
    val bytes = graft.operators.CorpusOps.evalShingleBloom(
      d0.filter(col("doc_id") < 50), shingleN = 3)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("xs", ArrayType(LongType))))
    val probe = d0.select(col("doc_id").as("id"),
      ArrayHashExprs.shingle_hashes(
        graft.functions.TextFunctions.normText(col("text")), 3).as("xs"))
      .unionByName(spark.createDataFrame(Seq(
        Row(9001L, Seq(1L, null, 2L)), // null element = miss, not crash
        Row(9002L, Seq.empty[Long]),   // empty = 0 hits
        Row(9003L, null)               // null array = null count
      ).asJava, schema))
    val diff = probe.select(col("id"),
      ArrayHashExprs.bloom_hits(col("xs"), bytes).as("fused"),
      size(filter(col("xs"), g =>
        graft.operators.CorpusOps.shingleMightContain(bytes, g)))
        .cast("long").as("hof"))
      .filter(!(col("fused") <=> col("hof")))
      .collect()
    assert(diff.isEmpty, s"bloom_hits diverges from the HOF: ${diff.toSeq}")
    // sanity: the sketch actually fires on the docs it was built from
    val hits = probe.filter(col("id") < 50)
      .select(ArrayHashExprs.bloom_hits(col("xs"), bytes).as("h"))
      .collect().map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
    assert(hits.exists(_ > 0L), "sketch never fired on its own inputs")
  }

  test("two bloom_hits gates over equal sketch bytes canonicalize equal") {
    // the sketch rides as ArraySeq[Byte]: Array's reference-based
    // equals would make semantically identical gates never compare
    // equal, defeating canonicalization and common-subexpression
    // elimination (a gate referenced twice in one projection would
    // deserialize and probe twice)
    val bytes = graft.operators.CorpusOps.evalShingleBloom(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") < 10), shingleN = 3)
    val copy = bytes.clone() // distinct array instance, same contents
    val child =
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("xs"))
    import scala.collection.immutable.ArraySeq
    def holder(bs: Array[Byte]) =
      new ArrayHashExprs.SketchBytes(ArraySeq.unsafeWrapArray(bs))
    val a = ArrayHashExprs.BloomHitsExpr(child, holder(bytes))
    val b = ArrayHashExprs.BloomHitsExpr(child, holder(copy))
    assert(a == b, "content-equal gates must be equal")
    assert(a.semanticEquals(b), "content-equal gates must canonicalize equal")
    assert(a.hashCode == b.hashCode)
    // the holder's hash is computed ONCE at construction (Catalyst
    // re-hashes expressions per plan transform; a bare ArraySeq would
    // walk the serialized sketch each time) — a content mutation after
    // construction not changing the hash is the observable signature
    // of the cache. Only the spec mutates; production wraps fresh
    // serializations.
    val mutated = bytes.clone()
    val h = holder(mutated)
    val before = h.hashCode
    mutated(0) = (mutated(0) ^ 0x5a).toByte
    assert(h.hashCode == before,
      "SketchBytes must cache its hash at construction, not recompute")
    // content inequality still detected (equality is content-based)
    assert(holder(bytes) != new ArrayHashExprs.SketchBytes(
      ArraySeq.unsafeWrapArray(bytes.dropRight(1))))
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
