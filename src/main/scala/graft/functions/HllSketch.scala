package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge, GraftInputTypes}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** PINNED HyperLogLog: an order-independent distinct-count sketch with
  * a wire format any engine can replay, replacing the engine-internal
  * sketches (`approx_count_distinct` / DataSketches `hll_sketch_agg`)
  * the approx queries previously rode on. Those are excellent at
  * scale but their register layout and hash are engine-private, so
  * the driver could only rows-check them. This sketch pins every
  * ingredient as public arithmetic:
  *
  *   - hash: FNV-1a 64-bit over the value's CODEPOINTS (== bytes on
  *     ASCII; the unit both engines see identically), finished with
  *     murmur3's `fmix64` avalanche ([[Hash64Expr]], codegen'd — the
  *     engine-portable choice: a unit fold + three xorshift-multiply
  *     steps any SQL engine can replay in mod-2^64 arithmetic,
  *     unlike xxhash64's block/rotate structure);
  *   - registers: `m = 2^12` buckets, index = top 12 hash bits,
  *     rho = leading-zero count of the remaining 52 bits + 1
  *     (capped at 53 when they are all zero);
  *   - merge: elementwise register MAX — commutative, associative,
  *     idempotent, so the result is IDENTICAL for every partitioning,
  *     shuffle order, and replay (the property the engine-internal
  *     sketches also have, here made externally checkable);
  *   - estimate: `round(alpha·m²·2^64 / Σ_j 2^(64-r_j))` computed
  *     ENTIRELY in exact integer arithmetic — the numerator is the
  *     88-bit integer a double holds exactly ([[RawNumeratorBig]]),
  *     the register sum ≤ 2^76, and the rounded quotient is the
  *     half-up identity `(2·num + sum) / (2·sum)` (floor division;
  *     every intermediate < 2^90, inside decimal/HUGEINT on both
  *     engines) — plus the standard small-range linear-counting
  *     correction `round(m·ln(m/V))` when V registers are empty and
  *     the raw estimate would be ≤ 2.5m, that branch ALSO selected
  *     on the exact sum: `raw ≤ 2.5m ⟺ sum·(2.5m) ≥ num`, i.e.
  *     `sum·10240 ≥ num` with both sides exact integers.
  *
  * The single cross-engine float hazard is the small-range `ln` (libm
  * vs Math.log may differ in the last ulp), already inside a
  * `round(..)::long`; the raw branch and — critically — the CHOICE of
  * branch involve no floating point at all, so a knife-edge register
  * sum cannot send the two engines down different branches (the
  * hazard graft's round-14 advice flagged: DuckDB's HUGEINT→DOUBLE
  * cast may double-round where BigInt.doubleValue rounds correctly).
  * The DuckDB oracle ([[graft.OracleSql]]) reproduces the estimate
  * hash-for-hash.
  *
  * Scale shape: [[HllSketchAgg]] is a `TypedImperativeAggregate`
  * whose buffer is the 4 KiB register array — map-side partials fold
  * every input row locally and ONE buffer per group per partition
  * crosses the wire (the `countDistinct` rewrite would exchange the
  * full value stream). Sketches persist as plain BINARY columns and
  * union via [[HllUnionAgg]] without rescanning the corpus — the
  * sketch-at-rest bookkeeping pattern at 100 TB.
  */
object HllSketch {

  /** Register-index bits: m = 4096 registers, 4 KiB per sketch. */
  val P: Int = 12
  val M: Int = 1 << P
  /** Max rho: all 52 post-index bits zero → 52 leading zeros + 1. */
  val MaxRho: Int = 64 - P + 1

  /** Bias factor for m ≥ 128 (Flajolet et al., HLL 2007). */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** The whole numerator `alpha·m²·2^64` folded to ONE double
    * constant (magnitude ~2^87.5, ulp 2^35 — an exact integer). */
  val RawNumerator: Double = Alpha * M * M * math.pow(2.0, 64)

  /** [[RawNumerator]]'s exact integer value, the form both engines
    * actually compute with: spliced into the oracle SQL as a HUGEINT
    * literal, used here for the exact-integer quotient and branch. */
  val RawNumeratorBig: BigInt = {
    // new j.m.BigDecimal(d) is the EXACT binary value (scala's
    // BigDecimal(d) would give the shortest round-trip decimal)
    val b = BigDecimal(new java.math.BigDecimal(RawNumerator))
      .toBigIntExact.getOrElse(
        sys.error("RawNumerator is not an exact integer"))
    require(b.bitLength <= 126, s"numerator ${b.bitLength} bits > HUGEINT")
    b
  }

  /** Small-range threshold 2.5m as the exact integer 2·(2.5m)/2 =
    * 10240: `raw ≤ 2.5m ⟺ sum·SmallRangeInt ≥ num`, all integers. */
  val SmallRangeInt: Int = (5 * M) / 2

  // ---- The pinned 64-bit hash: FNV-1a 64 (canonical basis/prime —
  // unlike graft.functions.Fnv32, the reference's quirky 32-bit
  // variant kept for bit-compat) followed by the murmur3 `fmix64`
  // finalizer. The finalizer is NOT optional: raw FNV-1a leaves its
  // TOP bits badly clustered on short similar strings (measured: 5000
  // decimal doc-id strings hit only ~170 of 4096 top-12-bit register
  // indexes, collapsing the estimate 30×), and HLL indexes by exactly
  // those bits. fmix64's xorshift+multiply avalanche fixes the
  // distribution; every constant is public domain and the whole chain
  // stays replayable in mod-2^64 SQL arithmetic.
  val Fnv64Basis: Long = 0xcbf29ce484222325L
  val Fnv64Prime: Long = 0x100000001b3L
  val FmixC1: Long = 0xff51afd7ed558ccdL
  val FmixC2: Long = 0xc4ceb9fe1a85ec53L

  def fmix64(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= FmixC1
    h ^= h >>> 33
    h *= FmixC2
    h ^= h >>> 33
    h
  }

  /** The pinned hash over a STRING's CODEPOINTS (== bytes on ASCII).
    * Codepoints, not UTF-8 bytes, are the cross-engine unit — the
    * oracle's `unicode(substr(...))` fold sees codepoints, and the
    * repo pinned this exact contract once before
    * ([[TextExprs.RollingHashExpr]]): a byte fold here would silently
    * diverge on the first non-ASCII character. FNV's byte granularity
    * is not load-bearing for a sketch hash — only determinism and
    * avalanche are, and fmix64 supplies the latter for codepoint-wide
    * units too. */
  def hash64String(s: String): Long = {
    var h = Fnv64Basis
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h ^ cp) * Fnv64Prime
      i += Character.charCount(cp)
    }
    fmix64(h)
  }

  /** Codegen'd fmix64∘fnv1a64 over a STRING column's codepoints (see
    * [[hash64String]] for why codepoints). */
  case class Hash64Expr(child: Expression) extends UnaryExpression
    with GraftInputTypes {
    override def graftInputTypes: Seq[DataType] =
      Seq(org.apache.spark.sql.types.StringType)
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any =
      hash64String(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
           |final String $s = $c.toString();
           |long $h = ${Fnv64Basis}L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  final int $cp = $s.codePointAt($i);
           |  $h = ($h ^ $cp) * ${Fnv64Prime}L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |$h ^= $h >>> 33;
           |$h *= ${FmixC1}L;
           |$h ^= $h >>> 33;
           |$h *= ${FmixC2}L;
           |$h ^= $h >>> 33;
           |${ev.value} = $h;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Hash64Expr =
      copy(child = newChild)
  }

  /** Fold one hashed value into the register array. */
  def add(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rho = if (w == 0L) MaxRho else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > (regs(idx) & 0xff)) regs(idx) = rho.toByte
  }

  /** Elementwise-max merge of `other` into `into`. */
  def maxInto(into: Array[Byte], other: Array[Byte]): Unit = {
    var j = 0
    while (j < M) {
      if ((other(j) & 0xff) > (into(j) & 0xff)) into(j) = other(j)
      j += 1
    }
  }

  /** The rounded HLL count over a register array. The register sum,
    * the branch choice, and the raw quotient are EXACT integers
    * (BigInt; the oracle's HUGEINT); the small-range branch's `ln` is
    * the only floating-point operation left in the whole estimate. */
  def estimateLong(regs: Array[Byte]): Long = {
    var zeros = 0
    var sum = BigInt(0)
    var j = 0
    while (j < M) {
      val r = regs(j) & 0xff
      if (r == 0) zeros += 1
      sum += BigInt(1) << (64 - r)
      j += 1
    }
    if (zeros > 0 && sum * SmallRangeInt >= RawNumeratorBig)
      math.round(M * math.log(M.toDouble / zeros))
    else // round-half-up of num/sum via floor((2·num + sum) / (2·sum))
      ((RawNumeratorBig * 2 + sum) / (sum * 2)).toLong
  }

  /** Register-array aggregate over a 64-bit-hash column. Buffer = the
    * 4 KiB byte array; partial aggregation folds rows map-side and
    * ships one buffer per (group × partition). Deterministic under
    * any partitioning/replay: max-merge is order-free. */
  case class HllSketchAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with GraftInputTypes {

    override def graftInputTypes: Seq[DataType] = Seq(LongType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_hll_sketch"

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
      maxInto(buf, other)
      buf
    }

    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): HllSketchAgg = copy(child = c(0))
  }

  /** Union of persisted sketches (BINARY register arrays) — the
    * merge-at-rest half of the pattern: any source subset's distinct
    * count comes from maxing its sketch ROWS, never a corpus rescan. */
  case class HllUnionAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with GraftInputTypes {

    override def graftInputTypes: Seq[DataType] = Seq(BinaryType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_hll_union"

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val other = v.asInstanceOf[Array[Byte]]
        require(other.length == M,
          s"graft_hll_union: sketch of ${other.length} registers, expected $M")
        maxInto(buf, other)
      }
      buf
    }

    override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
      maxInto(buf, other)
      buf
    }

    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(n: Int): HllUnionAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): HllUnionAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): HllUnionAgg = copy(child = c(0))
  }

  /** Estimate a BINARY register array → the rounded distinct COUNT
    * (runs once per GROUP row, so CodegenFallback costs nothing
    * measurable). Long, not double: the estimate is integer-exact
    * except the small-range `ln` — see the object scaladoc. */
  case class HllEstimateExpr(child: Expression) extends UnaryExpression
    with GraftInputTypes with CodegenFallback {
    override def graftInputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any = {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == M,
        s"graft_hll_estimate: sketch of ${regs.length} registers, expected $M")
      estimateLong(regs)
    }

    override protected def withNewChildInternal(newChild: Expression): HllEstimateExpr =
      copy(child = newChild)
  }

  // ---- Column surface -------------------------------------------------

  /** fmix64∘fnv64 of a column's codepoints (non-string inputs cast to
    * their canonical string form — which is also how the oracle
    * models them). */
  def hash64(c: Column): Column =
    ColumnBridge.column(Hash64Expr(ColumnBridge.catalystExpression(c.cast("string"))))

  /** Sketch-build aggregate over any column (hashed via [[hash64]];
    * non-string inputs should be cast to their canonical string form
    * first so the oracle can replay the bytes).
    *
    * PERF: prefer hashing in a PROJECTION and aggregating the long
    * with [[hllSketchOfHash]] — an aggregate child evaluates
    * interpreted inside the update loop, a projected [[hash64]] runs
    * in whole-stage codegen (measured ~1.7× on the md5-fingerprint
    * query). This convenience form is for small inputs. */
  def hllSketch(c: Column): Column = hllSketchOfHash(hash64(c))

  /** Sketch-build aggregate over an ALREADY-[[hash64]]-ed long
    * column — the hot-path form: keep the hash in the codegen'd
    * projection, leave the aggregate child a bound reference. */
  def hllSketchOfHash(c: Column): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.catalystExpression(c))
        .toAggregateExpression())

  /** Union aggregate over persisted sketch rows. */
  def hllUnion(c: Column): Column =
    ColumnBridge.column(
      HllUnionAgg(ColumnBridge.catalystExpression(c)).toAggregateExpression())

  /** Rounded distinct-count estimate of a sketch column (LONG — the
    * rounding is inside [[estimateLong]], integer-exact on the raw
    * branch). */
  def hllDistinct(c: Column): Column =
    ColumnBridge.column(HllEstimateExpr(ColumnBridge.catalystExpression(c)))
}
