package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the sketch hot loops.
  *
  * The declarative formulations (32 `aggregate` HOF passes for SimHash,
  * 16 `transform`+`array_min` passes for MinHash) evaluate lambdas
  * interpreted, outside whole-stage codegen — ~n×bits interpreted steps
  * per row. These expressions generate a single fused Java loop per row
  * instead (one pass over the hash array, all bit-planes / permutations
  * updated in registers), exactly the
  * custom-`Expression`-beats-composition case from the design notes.
  * Semantics are bit-identical to the declarative forms FOR NULL-FREE
  * ARRAYS — the only arrays the engine produces ([[graft.functions
  * .TextFunctions.normText]] never yields null elements). On arrays
  * WITH null elements the pairs diverge by construction: the native
  * expressions skip a null element (and return sentinel/null for
  * all-null or empty input) where the declarative HOF forms thread
  * the null through SQL three-valued logic — don't feed either form
  * hand-built null-element arrays and expect parity. The DuckDB
  * oracles ([[graft.OracleSql]]) are unchanged.
  */
object ArrayHashExprs {

  /** TRUE iff the array has no null elements (null input → null, the
    * UnaryExpression default). The codegen'd well-formedness gate the
    * ANN corpus scans filter with: the HOF form
    * `!exists(arr, _.isNull)` evaluates its lambda INTERPRETED per
    * element and measurably taxed every ANN query when it joined
    * unitIndex (10–50% at sf0.1, worst on q_ann_recall's six corpus
    * passes); this loop stays inside whole-stage codegen and consults
    * only the null bitmap — the element type is irrelevant, so any
    * array type is accepted.
    */
  case class ArrayNoNullsExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case _: ArrayType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckFailure(s"array_no_nulls needs an array, got $t")
      }
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      var ok = true
      while (ok && i < arr.numElements()) {
        if (arr.isNullAt(i)) ok = false
        i += 1
      }
      ok
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val i = ctx.freshName("i")
        val ok = ctx.freshName("ok")
        s"""
           |boolean $ok = true;
           |for (int $i = 0; $ok && $i < $c.numElements(); $i++) {
           |  if ($c.isNullAt($i)) $ok = false;
           |}
           |${ev.value} = $ok;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): ArrayNoNullsExpr =
      copy(child = newChild)
  }

  /** TRUE iff some NON-NULL element of the `array<double>` is
    * non-zero — the codegen'd zero-norm gate of the banded near-pair
    * family (a zero unit vector lands in LSH signature 0 of every
    * table; see Similarity.lshNearPairsUnsorted). Same
    * interpreted-HOF-replacement rationale as [[ArrayNoNullsExpr]].
    */
  case class ArrayHasNonZeroExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {
    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      var found = false
      while (!found && i < arr.numElements()) {
        if (!arr.isNullAt(i) && arr.getDouble(i) != 0.0) found = true
        i += 1
      }
      found
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val i = ctx.freshName("i")
        val found = ctx.freshName("found")
        s"""
           |boolean $found = false;
           |for (int $i = 0; !$found && $i < $c.numElements(); $i++) {
           |  if (!$c.isNullAt($i) && $c.getDouble($i) != 0.0) $found = true;
           |}
           |${ev.value} = $found;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): ArrayHasNonZeroExpr =
      copy(child = newChild)
  }

  /** SimHash over an `array<long>` of element hashes: bit j of the
    * result is set iff Σ_elements (bit j set ? +1 : -1) > 0.
    */
  case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(LongType))
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val counts = new Array[Int](bits)
      var i = 0
      while (i < arr.numElements()) {
        // null elements (possible via SQL array literals) are skipped —
        // identical behavior interpreted and codegen'd
        if (!arr.isNullAt(i)) {
          val x = arr.getLong(i)
          var j = 0
          while (j < bits) {
            counts(j) += (if (((x >> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < bits) {
        if (counts(j) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val counts = ctx.freshName("counts")
        val x = ctx.freshName("x")
        val sig = ctx.freshName("sig")
        s"""
           |final int $n = $c.numElements();
           |final int[] $counts = new int[$bits];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($c.isNullAt($i)) continue;
           |  final long $x = $c.getLong($i);
           |  for (int $j = 0; $j < $bits; $j++) {
           |    $counts[$j] += ((($x >> $j) & 1L) == 1L) ? 1 : -1;
           |  }
           |}
           |long $sig = 0L;
           |for (int $j = 0; $j < $bits; $j++) {
           |  if ($counts[$j] > 0) $sig |= (1L << $j);
           |}
           |${ev.value} = $sig;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
      copy(child = newChild)
  }

  /** MinHash signature over an `array<long>` of element hashes: for
    * each of `numHashes` fixed universal-hash permutations
    * ([[Hashing.permCoeffs]]), the minimum of `(a_i*(x mod p)+b_i) mod p`
    * over the array. Returns `array<long>` of length `numHashes`;
    * null for an empty input array (matching `array_min`'s
    * empty→null).
    */
  case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(LongType))
    private val p = Hashing.MersennePrime31
    private val coeffA: Array[Long] =
      (0 until numHashes).map(i => Hashing.permCoeffs(i)._1).toArray
    private val coeffB: Array[Long] =
      (0 until numHashes).map(i => Hashing.permCoeffs(i)._2).toArray

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) return null
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val y = arr.getLong(i) % p
          var q = 0
          while (q < numHashes) {
            val h = (coeffA(q) * y + coeffB(q)) % p
            if (h < mins(q)) mins(q) = h
            q += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
      nullSafeCodeGen(ctx, ev, c => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val q = ctx.freshName("q")
        val y = ctx.freshName("y")
        val h = ctx.freshName("h")
        val mins = ctx.freshName("mins")
        s"""
           |final int $n = $c.numElements();
           |if ($n == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  final long[] $mins = new long[$numHashes];
           |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($c.isNullAt($i)) continue;
           |    final long $y = $c.getLong($i) % ${p}L;
           |    for (int $q = 0; $q < $numHashes; $q++) {
           |      final long $h = ($aRef[$q] * $y + $bRef[$q]) % ${p}L;
           |      if ($h < $mins[$q]) $mins[$q] = $h;
           |    }
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
           |}
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
      copy(child = newChild)
  }

  /** 31-bit polynomial string hash:
    * `h = (h * 1000003 + byte) mod (2^31-1)` over UTF-8 bytes, h₀ = 0.
    * The cross-engine-reproducible base hash for minhash/simhash
    * shingles — DuckDB mirror:
    * `list_reduce(list_concat([0], codes), (h,b) -> (h*1000003+b) % 2147483647)`.
    * Replaces an md5-prefix+hex-parse formulation whose string churn
    * dominated sketch runtime; products stay < 2^51 (no overflow).
    */
  case class PolyHash31Expr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {
    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(org.apache.spark.sql.types.StringType)
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * 1000003L + (bytes(i) & 0xff)) % 2147483647L
        i += 1
      }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        s"""
           |final byte[] $bytes = $c.getBytes();
           |long $h = 0L;
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  $h = ($h * 1000003L + ($bytes[$i] & 0xff)) % 2147483647L;
           |}
           |${ev.value} = $h;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): PolyHash31Expr =
      copy(child = newChild)
  }

  def poly_hash31(s: Column): Column =
    ColumnBridge.column(PolyHash31Expr(ColumnBridge.expression(s)))

  /** Fused shingle hasher: single-space-separated normalized text →
    * distinct 31-bit polynomial hashes of its word n-gram shingles,
    * in first-occurrence order. One generated loop replaces the
    * interpreted `transform(shingles(...), poly_hash31)` HOF chain
    * (tokenize + slice + concat_ws + array_distinct + hash), which is
    * the sketch operators' hot path. Texts with fewer than n tokens
    * hash the whole text as one shingle. Hash values are identical to
    * `PolyHash31Expr` over the shingle strings ("tok1 tok2 tok3" —
    * the 0x20 separator bytes are folded in), so oracles mirror via
    * `list_distinct(list_transform(<raw shingles>, polyhash))`.
    */
  case class ShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(org.apache.spark.sql.types.StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      // token start offsets (single-space-separated normalized input)
      val starts = scala.collection.mutable.ArrayBuffer(0)
      var i = 0
      while (i < bytes.length) {
        if (bytes(i) == ' '.toByte) starts += i + 1
        i += 1
      }
      val nTokens = starts.length
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      if (nTokens < n) {
        var h = 0L
        var j = 0
        while (j < bytes.length) { h = (h * 1000003L + (bytes(j) & 0xff)) % 2147483647L; j += 1 }
        out.add(h)
      } else {
        var s = 0
        while (s + n <= nTokens) {
          val from = starts(s)
          val until = if (s + n < nTokens) starts(s + n) - 1 else bytes.length
          var h = 0L
          var j = from
          while (j < until) { h = (h * 1000003L + (bytes(j) & 0xff)) % 2147483647L; j += 1 }
          out.add(h)
          s += 1
        }
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = it.next(); k += 1 }
      new GenericArrayData(arr)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val starts = ctx.freshName("starts")
        val nTok = ctx.freshName("nTok")
        val set = ctx.freshName("set")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val from = ctx.freshName("from")
        val until = ctx.freshName("until")
        val arr = ctx.freshName("arr")
        val k = ctx.freshName("k")
        val itv = ctx.freshName("it")
        // every generated local MUST go through freshName: a literal
        // name can collide with an enclosing generated scope's local
        // (Java forbids shadowing), failing janino compilation and
        // silently dropping the whole stage to interpreted execution
        val fillPos = ctx.freshName("fillPos")
        s"""
           |final byte[] $bytes = $c.getBytes();
           |int $nTok = 1;
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  if ($bytes[$i] == (byte) ' ') $nTok++;
           |}
           |final int[] $starts = new int[$nTok + 1];
           |{
           |  int $fillPos = 1;
           |  for (int $i = 0; $i < $bytes.length; $i++) {
           |    if ($bytes[$i] == (byte) ' ') $starts[$fillPos++] = $i + 1;
           |  }
           |  $starts[$nTok] = $bytes.length + 1;
           |}
           |final java.util.LinkedHashSet $set = new java.util.LinkedHashSet();
           |if ($nTok < $n) {
           |  long $h = 0L;
           |  for (int $j = 0; $j < $bytes.length; $j++) {
           |    $h = ($h * 1000003L + ($bytes[$j] & 0xff)) % 2147483647L;
           |  }
           |  $set.add(java.lang.Long.valueOf($h));
           |} else {
           |  for (int $s = 0; $s + $n <= $nTok; $s++) {
           |    final int $from = $starts[$s];
           |    final int $until = $starts[$s + $n] - 1;
           |    long $h = 0L;
           |    for (int $j = $from; $j < $until; $j++) {
           |      $h = ($h * 1000003L + ($bytes[$j] & 0xff)) % 2147483647L;
           |    }
           |    $set.add(java.lang.Long.valueOf($h));
           |  }
           |}
           |final long[] $arr = new long[$set.size()];
           |int $k = 0;
           |for (java.util.Iterator $itv = $set.iterator(); $itv.hasNext(); ) {
           |  $arr[$k++] = ((java.lang.Long) $itv.next()).longValue();
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
      copy(child = newChild)
  }

  def shingle_hashes(normText: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(normText), n))

  /** Count of `array<long>` elements that MIGHT be in the serialized
    * Bloom sketch — the fused, codegen'd form of
    * `size(filter(xs, g => bloom_might_contain(bytes, g)))`, whose
    * ArrayFilter lambda evaluates INTERPRETED once per element per row
    * (the same 10–50% tax the hygiene-gate expressions in this file
    * were measured paying) on the streaming decontamination gate's
    * per-micro-batch hot path. Null elements count as misses, matching
    * the HOF (a null probe is a null predicate, dropped by `filter`);
    * a null array is a null count. The sketch deserializes ONCE per
    * task through a codegen reference object, never per row. The
    * sketch rides inside [[SketchBytes]] — NOT a bare `Array[Byte]`,
    * whose reference-based equals/hashCode would make two identical
    * gates never compare equal, defeating expression canonicalization
    * and common-subexpression elimination — and the holder caches its
    * content hash, because Catalyst re-hashes expressions on every
    * plan transform and a bare `ArraySeq[Byte]` would walk the whole
    * serialized sketch (MBs at real fpp/capacity) each time.
    */
  case class BloomHitsExpr(child: Expression, sketch: SketchBytes)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(LongType))
    override def dataType: DataType = LongType

    @transient private lazy val bloom =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(sketch.bytes.toArray))

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      var hits = 0L
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i) && bloom.mightContainLong(arr.getLong(i)))
          hits += 1L
        i += 1
      }
      hits
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val b = ctx.addReferenceObj("bloom", bloom,
          "org.apache.spark.util.sketch.BloomFilter")
        val i = ctx.freshName("i")
        val hits = ctx.freshName("hits")
        s"""
           |long $hits = 0L;
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  if (!$c.isNullAt($i) && $b.mightContainLong($c.getLong($i))) {
           |    $hits++;
           |  }
           |}
           |${ev.value} = $hits;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): BloomHitsExpr =
      copy(child = newChild)
  }

  /** Serialized-sketch holder with content equality and a hash
    * computed ONCE at construction. A case-class expression parameter
    * is hashed by Catalyst on every analysis/optimization transform;
    * a bare byte sequence makes each of those O(sketch size). The
    * cached-hash fast path in equals keeps the common
    * all-gates-distinct comparison O(1) too; content comparison runs
    * only on a hash collision, preserving canonicalization exactly. */
  final class SketchBytes(
      val bytes: scala.collection.immutable.ArraySeq[Byte])
    extends Serializable {
    override val hashCode: Int = bytes.hashCode
    override def equals(o: Any): Boolean = o match {
      case s: SketchBytes =>
        (s eq this) || (s.hashCode == hashCode && s.bytes == bytes)
      case _ => false
    }
  }

  def bloom_hits(xs: Column, bytes: Array[Byte]): Column =
    ColumnBridge.column(BloomHitsExpr(ColumnBridge.expression(xs),
      new SketchBytes(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes))))

  /** Sequential-fold dot product over two `array<double>` columns:
    * `acc = 0.0; acc += a[i]*b[i]` in index order — the same IEEE
    * operation sequence as the declarative
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` it replaces (which
    * evaluated its lambdas interpreted, outside codegen), and the same
    * as the oracle's `list_reduce` fold. */
  case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(org.apache.spark.sql.types.DoubleType),
        ArrayType(org.apache.spark.sql.types.DoubleType))
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i))
          acc += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) continue;
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProductExpr =
      copy(left = newLeft, right = newRight)
  }

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def array_no_nulls(a: Column): Column =
    ColumnBridge.column(ArrayNoNullsExpr(ColumnBridge.expression(a)))

  def array_has_nonzero(a: Column): Column =
    ColumnBridge.column(ArrayHasNonZeroExpr(ColumnBridge.expression(a)))

  /** Unit-normalize an `array<double>` in one fused loop: norm is the
    * sqrt of the [[DotProductExpr]]-identical sequential self-dot fold,
    * then each element divides by it — the same IEEE op sequence as the
    * `sqrt(dot(v,v))` + per-element `transform` composition it replaces
    * (whose lambda evaluated interpreted, once per element, outside
    * codegen). Zero-norm vectors map to all-zero output (NOT NaN —
    * NaN sorts first under desc and would poison every top-k); null
    * elements stay null except in that zero-norm case, mirroring the
    * replaced `when(nrm === 0, 0.0).otherwise(x / nrm)`. */
  case class UnitVectorExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.DoubleType)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) { val x = a.getDouble(i); acc += x * x }
        i += 1
      }
      val nrm = math.sqrt(acc)
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (nrm == 0.0) java.lang.Double.valueOf(0.0)
          else if (a.isNullAt(i)) null
          else java.lang.Double.valueOf(a.getDouble(i) / nrm)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val nrm = ctx.freshName("nrm")
        val arr = ctx.freshName("arr")
        val i = ctx.freshName("i")
        val x = ctx.freshName("x")
        s"""
           |final int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    final double $x = $a.getDouble($i);
           |    $acc += $x * $x;
           |  }
           |}
           |final double $nrm = java.lang.Math.sqrt($acc);
           |final Object[] $arr = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($nrm == 0.0) {
           |    $arr[$i] = java.lang.Double.valueOf(0.0);
           |  } else if ($a.isNullAt($i)) {
           |    $arr[$i] = null;
           |  } else {
           |    $arr[$i] = java.lang.Double.valueOf($a.getDouble($i) / $nrm);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): UnitVectorExpr =
      copy(child = newChild)
  }

  /** Asymmetric-distance lookup for product-quantized vectors: given a
    * row's PQ `codes` (`array<int>`, one sub-centroid id per
    * subquantizer) and a query's lookup table `lut`
    * (`array<array<double>>`, `lut[m][c]` = the query's precomputed
    * partial score against sub-centroid `c` of subquantizer `m`), the
    * approximate score is Σ_m lut[m][codes[m]] — M array lookups per
    * candidate instead of a D-dimensional dot product. One fused
    * codegen'd loop; a code with no LUT entry (id out of range, null
    * element) contributes 0 rather than poisoning the scan with an
    * index error — encode and LUT come from the same codebook, so the
    * defensive branch is dead in correct pipelines.
    */
  case class PqAdcExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
        ArrayType(ArrayType(org.apache.spark.sql.types.DoubleType)))
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val codes = l.asInstanceOf[ArrayData]
      val lut = r.asInstanceOf[ArrayData]
      val m = math.min(codes.numElements(), lut.numElements())
      var acc = 0.0
      var i = 0
      while (i < m) {
        if (!codes.isNullAt(i) && !lut.isNullAt(i)) {
          val c = codes.getInt(i)
          val sub = lut.getArray(i)
          if (c >= 0 && c < sub.numElements() && !sub.isNullAt(c))
            acc += sub.getDouble(c)
        }
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (codes, lut) => {
        val m = ctx.freshName("m")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        val sub = ctx.freshName("sub")
        s"""
           |final int $m = java.lang.Math.min($codes.numElements(), $lut.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $m; $i++) {
           |  if ($codes.isNullAt($i) || $lut.isNullAt($i)) continue;
           |  final int $c = $codes.getInt($i);
           |  final org.apache.spark.sql.catalyst.util.ArrayData $sub = $lut.getArray($i);
           |  if ($c >= 0 && $c < $sub.numElements() && !$sub.isNullAt($c))
           |    $acc += $sub.getDouble($c);
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcExpr =
      copy(left = newLeft, right = newRight)
  }

  def pq_adc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdcExpr(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut)))

  /** Element-wise vector subtraction (`array<double> - array<double>`)
    * in one fused loop — the residual step of residual product
    * quantization (`x - centroid(cell(x))`). Null elements propagate
    * null for that element; length mismatch truncates to the shorter
    * input (codebooks and vectors share dims in correct pipelines, so
    * both branches are defensive, not semantic).
    */
  case class VecSubExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    private val elemType = org.apache.spark.sql.types.DoubleType
    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(ArrayType(elemType), ArrayType(elemType))
    override def dataType: DataType = ArrayType(elemType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i))
          out(i) = a.getDouble(i) - b.getDouble(i)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i))
           |    $out[$i] = java.lang.Double.valueOf($a.getDouble($i) - $b.getDouble($i));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecSubExpr =
      copy(left = newLeft, right = newRight)
  }

  def vec_sub(a: Column, b: Column): Column =
    ColumnBridge.column(VecSubExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def unit_vector(v: Column): Column =
    ColumnBridge.column(UnitVectorExpr(ColumnBridge.expression(v)))

  def simhash_bits(hashes: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashExpr(ColumnBridge.expression(hashes), bits))

  def minhash_sig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSigExpr(ColumnBridge.expression(hashes), numHashes))
}
