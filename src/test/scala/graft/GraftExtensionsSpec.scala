package graft

import graft.functions.Fnv32

class GraftExtensionsSpec extends SparkSuite {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_poly_hash31('abc') AS ph,
        |       graft_fnv32(cast('123' as binary)) AS fnv,
        |       graft_simhash(array(1L, 3L, 7L)) AS sh,
        |       size(graft_minhash(array(42L))) AS mh_len
        |""".stripMargin).collect()(0)
    // poly hash: fold of bytes 97,98,99
    val expectedPh = Seq(97, 98, 99)
      .foldLeft(0L)((h, b) => (h * 1000003L + b) % 2147483647L)
    assert(r.getLong(0) == expectedPh)
    assert(r.getLong(1) == Fnv32.hashBytes("123".getBytes))
    assert(r.getLong(1) == 4051370033L) // independently computed vector
    assert(r.getLong(2) == 3L)          // bits 0,1 majority-set from 1,3,7
    assert(r.getInt(3) == 16)
  }

  test("text expressions are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_rolling_hash('hello world') AS rh,
        |       graft_lang_hits('the cat and der hund') AS hits,
        |       graft_bpe_punct_counts('Hi, 42!') AS bp
        |""".stripMargin).collect()(0)
    val expectedRh = "hello world"
      .foldLeft(0L)((h, c) => (h * 31L + c.toInt) % 1000000007L)
    assert(r.getLong(0) == expectedRh)
    assert(r.getSeq[Int](1) == Seq(2, 1, 0, 0, 0)) // en: the,and; de: der
    assert(r.getSeq[Int](2) == Seq(5, 2))          // Hi , 4 2 ! / , !
  }

  test("curation functions are callable from SQL with known values") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_split_name(7L) AS split,
        |       graft_hash_bucket(7L, 100) AS bucket,
        |       graft_sample_keep(7L, 1000) AS keep_all,
        |       graft_sample_keep(7L, 0) AS keep_none,
        |       graft_redact_pii('mail a@b.co or call 555-123-4567 now') AS red
        |""".stripMargin).collect()(0)
    // the SQL surface must agree with the Scala definitions bit-for-bit
    val bucket = Fnv32.hashBytes("7".getBytes) % 100
    assert(r.getLong(1) == bucket)
    assert(r.getString(0) ==
      (if (bucket < 80) "train" else if (bucket < 90) "val" else "test"))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getString(4) == "mail <email> or call <phone> now")
  }

  test("wrong argument counts raise a clean AnalysisException") {
    GraftExtensions.register(spark)
    for (sql <- Seq(
        "SELECT graft_dot(array(1.0d))",                       // too few
        "SELECT graft_poly_hash31('a', 'b')",                  // too many
        "SELECT graft_split_name()",                           // none
        "SELECT graft_redact_pii('a', 'b')",                   // too many
        "SELECT graft_unit_vector()")) {                       // none
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.toLowerCase.contains("parameter"),
        s"$sql: ${e.getMessage}")
    }
  }

  test("shingle/dot/unit-vector expressions are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT size(graft_shingle_hashes('a b c d')) AS n_shingles,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |       graft_unit_vector(array(3.0d, 4.0d)) AS unit,
        |       graft_unit_vector(array(0.0d, 0.0d)) AS zero_unit
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2)            // "a b c", "b c d"
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[Double](2) == Seq(0.6, 0.8))
    assert(r.getSeq[Double](3) == Seq(0.0, 0.0))
  }
}
