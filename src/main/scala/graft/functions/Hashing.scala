package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing primitives.
  *
  * The reference vendors a 32-bit FNV-1a-variant (`src/fnv32.rs:74-102`)
  * purely as a cheap key hash; SURVEY §2.F1 says NOT to replicate it
  * bit-for-bit. For engine-internal hashing (alive-key approx) we use
  * Spark's codegen'd `xxhash64`. For ORACLE-CHECKED hashing (minhash /
  * simhash / LSH), we need a hash DuckDB can reproduce exactly, so the
  * base is the first 60 bits of md5 — identical in any engine with md5
  * and hex parsing.
  */
object Hashing {

  val MersennePrime31: Long = 2147483647L // 2^31 - 1

  /** First 15 hex chars of md5(utf8(s)) as a non-negative int64
    * (60 bits). DuckDB equivalent:
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`.
    */
  def baseHash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** i-th universal-hash permutation of a base hash, for minhash
    * signatures: `(a_i * (x mod p) + b_i) mod p`, p = 2^31-1.
    * Coefficients are fixed (seeded by i) so oracles can regenerate
    * them; products stay < 2^62 (no int64 overflow).
    */
  def permHash(x: Column, i: Int): Column = {
    val (a, b) = permCoeffs(i)
    (lit(a) * (x % MersennePrime31) + lit(b)) % MersennePrime31
  }

  def permCoeffs(i: Int): (Long, Long) = {
    val a = ((1103515245L * (i + 1) + 12345L) % (MersennePrime31 - 1)) | 1L
    val b = (12345L * (i + 1) + 67890L) % MersennePrime31
    (a, b)
  }
}
