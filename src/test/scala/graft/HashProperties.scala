package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{Fnv32, Hashing}
import graft.operators.Similarity

/** ScalaCheck properties (SURVEY §5.2(2)) for the pure (driver-side)
  * hash/geometry functions — no SparkSession needed, so these run as
  * plain generative properties.
  */
object HashProperties extends Properties("graft.hashing") {

  property("fnv32 stays in u32 range and is deterministic") =
    Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val arr = bs.toArray
      val h = Fnv32.hashBytes(arr)
      h >= 0L && h <= 0xffffffffL && h == Fnv32.hashBytes(arr)
    }

  property("fnv32 of empty input is the offset basis") =
    Prop(Fnv32.hashBytes(Array.emptyByteArray) == (Fnv32.Basis.toLong & 0xffffffffL))

  property("fnv32 reference fold equivalence") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      val expected = s.getBytes("UTF-8").foldLeft(Fnv32.Basis) {
        (h, b) => (h ^ (b & 0xff)) * Fnv32.Basis
      }.toLong & 0xffffffffL
      Fnv32.hashBytes(s.getBytes("UTF-8")) == expected
    }

  property("permCoeffs produce valid universal-hash parameters") =
    Prop.forAll(Gen.choose(0, 1024)) { i =>
      val (a, b) = Hashing.permCoeffs(i)
      a > 0 && a < Hashing.MersennePrime31 && (a % 2 == 1) &&
        b >= 0 && b < Hashing.MersennePrime31
    }

  property("perm hash output stays in [0, p)") =
    Prop.forAll(Gen.choose(0, 63), Gen.choose(0L, Long.MaxValue)) { (i, x) =>
      val (a, b) = Hashing.permCoeffs(i)
      val h = (a * (x % Hashing.MersennePrime31) + b) % Hashing.MersennePrime31
      h >= 0 && h < Hashing.MersennePrime31
    }

  property("LSH plane components stay in [-1, 1] and are deterministic") =
    Prop.forAll(Gen.choose(0, 15), Gen.choose(0, 15),
      Gen.choose(0, Similarity.LshDims - 1)) { (t, j, d) =>
      val v = Similarity.planeComponent(t, j, d)
      v >= -1.0 && v <= 1.0 && v == Similarity.planeComponent(t, j, d)
    }

  property("poly hash 31 reference fold stays in [0, 2^31-1)") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      val h = s.getBytes("UTF-8").foldLeft(0L)(
        (acc, b) => (acc * 1000003L + (b & 0xff)) % 2147483647L)
      h >= 0 && h < 2147483647L
    }

  // --- fused text expressions: interpreted-path parity vs a direct
  // reference fold, over arbitrary unicode (incl. astral codepoints).
  // The codegen path is pinned separately by CodegenNoFallbackSpec.

  private def lit(s: String) =
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      s, org.apache.spark.sql.types.StringType)

  private val codepointGen: Gen[Int] = Gen.oneOf(
    Gen.choose(0x20, 0x7e),       // ASCII
    Gen.choose(0xa0, 0x2fff),     // Latin supplements .. CJK symbols
    Gen.choose(0x4e00, 0x9fff),   // CJK unified
    Gen.const(0x1f600))           // astral (surrogate pair in UTF-16)

  property("RollingHashExpr == codepoint fold for arbitrary unicode") =
    Prop.forAll(Gen.listOf(codepointGen)) { cps =>
      val s = new String(cps.toArray, 0, cps.length)
      val expected = cps.foldLeft(0L)((h, cp) => (h * 31L + cp) % 1000000007L)
      graft.functions.TextExprs.RollingHashExpr(lit(s)).eval() == expected
    }

  private val tokenGen: Gen[String] = Gen.oneOf(
    "the", "and", "of", "der", "die", "das", "el", "de", "le", "les",
    "的", "是", "xyz", "qq", "a", "it", "42", "étoile")

  property("BpePunctCountsExpr == java.util.regex reference counts") = {
    // the independent reference is the ACTUAL regex engine Spark's
    // regexp_extract_all uses, not a reimplementation of the loop
    val bpeRe = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.BpePattern)
    val punctRe = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.PunctPattern)
    def count(p: java.util.regex.Pattern, s: String): Int = {
      val m = p.matcher(s); var n = 0; while (m.find()) n += 1; n
    }
    Prop.forAll(Gen.listOf(codepointGen)) { cps =>
      val s = new String(cps.toArray, 0, cps.length)
      val got = graft.functions.TextExprs.BpePunctCountsExpr(lit(s))
        .eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      got == Seq(count(bpeRe, s), count(punctRe, s))
    }
  }

  property("orderableBits: unsigned key order == IEEE double order") = {
    // the distributed rank/select operators stand on this total-order
    // isomorphism; exercise the full double range including subnormals,
    // infinities, zeros of both signs, and values from every exponent
    val anyDouble: Gen[Double] = Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue)
        .map(java.lang.Double.longBitsToDouble) // random bit patterns
        .filterNot(_.isNaN),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue,
        -Double.MinPositiveValue, Double.MaxValue, Double.MinValue,
        Double.PositiveInfinity, Double.NegativeInfinity),
      Gen.choose(-1e6, 1e6))
    Prop.forAll(anyDouble, anyDouble) { (a, b) =>
      val cmp = java.lang.Long.compareUnsigned(
        graft.functions.DoubleBits.orderable(a),
        graft.functions.DoubleBits.orderable(b))
      Integer.signum(cmp) ==
        Integer.signum(java.lang.Double.compare(a, b))
    }
  }

  property("StopwordHitsExpr == per-list membership counts") = {
    import graft.functions.TextFunctions.{Langs, Stopwords}
    val lists = Langs.map(Stopwords)
    Prop.forAll(Gen.listOf(tokenGen)) { toks =>
      val s = toks.mkString(" ")
      // split(s, " ") semantics: the empty string yields one empty token
      val splitToks = if (toks.isEmpty) Seq("") else toks
      val expected = lists.map(ws => splitToks.count(ws.toSet))
      val got = graft.functions.TextExprs.StopwordHitsExpr(lit(s), lists)
        .eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      got == expected
    }
  }

  // ---- pinned-HLL sketch algebra (graft.functions.HllSketch) ------

  private def regsOf(values: Seq[String]): Array[Byte] = {
    val r = new Array[Byte](graft.functions.HllSketch.M)
    values.foreach(v => graft.functions.HllSketch.add(
      r, graft.functions.HllSketch.hash64String(v)))
    r
  }

  property("hash64 == codepoint-fold reference for arbitrary unicode") =
    Prop.forAll(Gen.listOf(Gen.choose(1, 0x10FFFF)
      .suchThat(cp => !Character.isSurrogate(cp.toChar) || cp > 0xFFFF))) { cps =>
      val s = new String(cps.toArray, 0, cps.length)
      val folded = s.codePoints().toArray.foldLeft(
        graft.functions.HllSketch.Fnv64Basis) {
        (h, cp) => (h ^ cp) * graft.functions.HllSketch.Fnv64Prime
      }
      graft.functions.HllSketch.hash64String(s) ==
        graft.functions.HllSketch.fmix64(folded)
    }

  property("hll registers depend only on the value SET (dup/order free)") =
    Prop.forAll(Gen.listOf(Gen.alphaNumStr)) { vs =>
      val shuffledDup = scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(vs ++ vs)
      java.util.Arrays.equals(regsOf(vs), regsOf(shuffledDup))
    }

  property("hll union of any split equals the whole-set sketch") =
    Prop.forAll(Gen.listOf(Gen.alphaNumStr), Gen.choose(0, 100)) { (vs, cut) =>
      val (a, b) = vs.splitAt(if (vs.isEmpty) 0 else cut % (vs.size + 1))
      val merged = regsOf(a)
      graft.functions.HllSketch.maxInto(merged, regsOf(b))
      java.util.Arrays.equals(merged, regsOf(vs))
    }

  property("hll estimate is exact on tiny sets and nonneg everywhere") =
    Prop.forAll(Gen.listOf(Gen.alphaNumStr)) { vs =>
      val est = graft.functions.HllSketch.estimateLong(regsOf(vs))
      est >= 0L && (vs.distinct.size > 8 ||
        est <= vs.distinct.size + 1)
    }
}
