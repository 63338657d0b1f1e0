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
}
