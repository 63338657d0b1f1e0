package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-analysis hot loops.
  *
  * The declarative forms — a per-character `aggregate(filter(split))`
  * fold for the rolling hash, five `filter(tokens, isInCollection)`
  * passes for stopword counting — evaluate their lambdas interpreted,
  * outside whole-stage codegen (the same pattern whose fusion bought
  * 8–12× on the sketch ops, see [[ArrayHashExprs]]). These fuse each
  * into one generated loop per row. Semantics are bit-identical to the
  * declarative forms (same codepoint sequence, same mod arithmetic,
  * same token-membership test), so the DuckDB oracles in
  * [[graft.OracleSql]] are unchanged; the declarative originals are
  * kept in [[TextFunctions]] as parity oracles.
  */
object TextExprs {

  /** Rabin–Karp-style rolling hash over the CODEPOINTS of a string:
    * `acc = (acc * 31 + cp) mod 1_000_000_007`, acc₀ = 0, in order.
    * Identical to the replaced
    * `aggregate(filter(split(s, ""), _ =!= ""), 0L, (acc, c) => (acc*31 + ascii(c)) % p)`
    * chain: Spark's `split(s, "")` yields one element per codepoint
    * (Java regex never splits a surrogate pair) and `ascii` returns the
    * first codepoint, so both fold the codepoint sequence. DuckDB
    * mirror: `list_reduce` over `unicode(substr(s, i, 1))`.
    */
  case class RollingHashExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
           |final String $s = $c.toString();
           |long $h = 0L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  final int $cp = $s.codePointAt($i);
           |  $h = ($h * 31L + $cp) % 1000000007L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = $h;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
      copy(child = newChild)
  }

  /** `rolling_hash(normText)` — see [[RollingHashExpr]]. */
  def rolling_hash(normText: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(normText)))

  /** Fused multi-list stopword counter: tokenize a single-space-
    * separated normalized string ONCE and count, per word list, how
    * many tokens are members — `array<int>` in `lists` order. Replaces
    * `lists.size` independent interpreted
    * `size(filter(split(norm, " "), _.isInCollection(words)))` passes
    * with one generated loop (token membership via a prebuilt
    * token → list-bitmask hash map; UTF-8 bytes never contain 0x20
    * inside a multi-byte sequence, so byte-level space scanning is
    * exact for any script). An empty string yields one empty token —
    * in no list — matching `split`'s `[""]`.
    */
  case class StopwordHitsExpr(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    require(lists.nonEmpty && lists.size <= 64,
      s"need 1..64 word lists, got ${lists.size}")

    override def graftInputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    /** token → bitmask of the lists containing it. UTF8String keys give
      * the same byte-equality `In`/`isInCollection` compares with. */
    private lazy val maskMap: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long]()
      for ((words, li) <- lists.zipWithIndex; w <- words) {
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << li)))
      }
      m
    }

    private def countHits(s: UTF8String): Array[Int] = {
      val bytes = s.getBytes
      val counts = new Array[Int](lists.size)
      var start = 0
      var i = 0
      while (i <= bytes.length) {
        if (i == bytes.length || bytes(i) == ' '.toByte) {
          val mask = maskMap.get(UTF8String.fromBytes(bytes, start, i - start))
          if (mask != null) {
            var l = 0
            val mv = mask.longValue()
            while (l < counts.length) {
              if (((mv >> l) & 1L) == 1L) counts(l) += 1
              l += 1
            }
          }
          start = i + 1
        }
        i += 1
      }
      counts
    }

    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(countHits(v.asInstanceOf[UTF8String]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mapRef = ctx.addReferenceObj("stopwordMask", maskMap, "java.util.HashMap")
      val nLists = lists.size
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val counts = ctx.freshName("counts")
        val start = ctx.freshName("start")
        val i = ctx.freshName("i")
        val l = ctx.freshName("l")
        val mask = ctx.freshName("mask")
        val mv = ctx.freshName("mv")
        s"""
           |final byte[] $bytes = $c.getBytes();
           |final int[] $counts = new int[$nLists];
           |int $start = 0;
           |for (int $i = 0; $i <= $bytes.length; $i++) {
           |  if ($i == $bytes.length || $bytes[$i] == (byte) ' ') {
           |    final Object $mask = $mapRef.get(
           |      org.apache.spark.unsafe.types.UTF8String.fromBytes($bytes, $start, $i - $start));
           |    if ($mask != null) {
           |      final long $mv = ((java.lang.Long) $mask).longValue();
           |      for (int $l = 0; $l < $nLists; $l++) {
           |        if ((($mv >> $l) & 1L) == 1L) $counts[$l]++;
           |      }
           |    }
           |    $start = $i + 1;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): StopwordHitsExpr =
      copy(child = newChild)
  }

  /** `stopword_hits(normText, lists)` — see [[StopwordHitsExpr]]. */
  def stopword_hits(normText: Column, lists: Seq[Seq[String]]): Column =
    ColumnBridge.column(StopwordHitsExpr(ColumnBridge.expression(normText), lists))

  /** Fused BPE-ish-token and punctuation counter over RAW text:
    * `array<int>` of
    *   [0] = matches of `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]` (letter runs
    *         count 1 each; every digit and every other non-space
    *         codepoint counts 1), and
    *   [1] = matches of `[^A-Za-z0-9\s]`,
    * in one codepoint loop. Replaces two `regexp_extract_all` calls
    * that materialized full match-string arrays just to `size()` them.
    * Counting semantics are exactly JAVA's regexes (greedy leftmost
    * alternation; `\s` = `[ \t\n\x0B\f\r]`) — i.e. what Spark's
    * `regexp_extract_all` computed before the fusion, pinned by a
    * ScalaCheck property against `java.util.regex` itself. Caveat
    * carried over unchanged from the regex forms: RE2's `\s` (DuckDB)
    * omits `\x0B`, so a document containing a vertical tab would
    * diverge from the DuckDB oracle — as it already would in every
    * `\s+` normalization. The driver corpus contains none.
    */
  case class BpePunctCountsExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var bpe = 0
      var punct = 0
      var inLetterRun = false
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
          if (!inLetterRun) { bpe += 1; inLetterRun = true }
        } else {
          inLetterRun = false
          if (cp >= '0' && cp <= '9') bpe += 1
          else if (cp != ' ' && cp != '\t' && cp != '\n' && cp != 0x0b &&
              cp != '\f' && cp != '\r') { bpe += 1; punct += 1 }
        }
        i += Character.charCount(cp)
      }
      new GenericArrayData(Array(bpe, punct))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val bpe = ctx.freshName("bpe")
        val punct = ctx.freshName("punct")
        val run = ctx.freshName("inLetterRun")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
           |final String $s = $c.toString();
           |int $bpe = 0;
           |int $punct = 0;
           |boolean $run = false;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  final int $cp = $s.codePointAt($i);
           |  if (($cp >= 'A' && $cp <= 'Z') || ($cp >= 'a' && $cp <= 'z')) {
           |    if (!$run) { $bpe++; $run = true; }
           |  } else {
           |    $run = false;
           |    if ($cp >= '0' && $cp <= '9') {
           |      $bpe++;
           |    } else if ($cp != ' ' && $cp != '\\t' && $cp != '\\n' &&
           |        $cp != 0x0b && $cp != '\\f' && $cp != '\\r') {
           |      $bpe++; $punct++;
           |    }
           |  }
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  new int[] { $bpe, $punct });
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): BpePunctCountsExpr =
      copy(child = newChild)
  }

  /** `bpe_punct_counts(text)` — see [[BpePunctCountsExpr]]. */
  def bpe_punct_counts(text: Column): Column =
    ColumnBridge.column(BpePunctCountsExpr(ColumnBridge.expression(text)))

  /** Fused training-data text cleaner: one byte scan emulating the
    * 5-pass regex chain of [[TextFunctions.cleanTextDeclarative]]
    * exactly —
    *   1. `https?://[^ \t\n\r]+` → " "   (URL strip)
    *   2. `[^ \t\n\r]+@[^ \t\n\r]+` → " " (email-like strip, on 1's output)
    *   3. `[\x00-\x1f]` → " "            (control chars)
    *   4. `([!?.,;:])\1+` → `$1`          (same-char punct runs)
    *   5. `lower(trim(regexp_replace(·, "\s+", " ")))`.
    *
    * Pass 5 collapses ALL whitespace runs and trims, so only the
    * SEQUENCE of non-whitespace segments matters — exact interim space
    * counts are irrelevant. That reduces passes 1–2 to per-token rules
    * over tokens split on `[ \t\n\r]` (the classes those regexes use):
    *   - a token containing `http://` or `https://` loses everything
    *     from the FIRST such occurrence to the token's end (the URL
    *     regex consumes greedily to the next hard space; a second URL
    *     in the same token is inside the first match);
    *   - the remainder is dropped entirely iff it has an '@' at an
    *     interior position i ∈ [1, len-2] (the email regex needs ≥1
    *     non-space byte on each side; leftmost-greedy then spans the
    *     whole token);
    *   - control bytes split the remainder (pass 3 turns them into
    *     spaces); each piece gets the same-char punct-run collapse.
    * Byte-level scanning is exact: every class byte is ASCII and UTF-8
    * continuation bytes are ≥ 0x80. Lowercasing calls
    * `UTF8String.toLowerCase` — the identical routine Spark's `lower`
    * uses under the default collation.
    */
  case class CleanTextExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {

    override def graftInputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      UTF8String.fromBytes(CleanTextExpr.clean(bytes)).toLowerCase
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val helper = CleanTextExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes(
           |  $helper.clean($c.getBytes())).toLowerCase();
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): CleanTextExpr =
      copy(child = newChild)
  }

  object CleanTextExpr {
    private def isHardSpace(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r'
    private def isCtrl(b: Byte): Boolean = (b & 0xff) < 0x20
    private def isRunPunct(b: Byte): Boolean =
      b == '!' || b == '?' || b == '.' || b == ',' || b == ';' || b == ':'

    /** First index in [from, until) where `http://` or `https://`
      * begins, or -1. */
    private def urlStart(bs: Array[Byte], from: Int, until: Int): Int = {
      var i = from
      while (i < until) {
        if (bs(i) == 'h' && i + 7 <= until &&
            bs(i + 1) == 't' && bs(i + 2) == 't' && bs(i + 3) == 'p') {
          var j = i + 4
          if (j < until && bs(j) == 's') j += 1
          // the regex's [^ \t\n\r]+ needs ≥1 byte after "://" — a bare
          // trailing "http://" is NOT a match and the token is kept
          if (j + 3 < until && bs(j) == ':' && bs(j + 1) == '/' && bs(j + 2) == '/')
            return i
        }
        i += 1
      }
      -1
    }

    /** The shared scan (interpreted eval AND generated code call this;
      * the logic is branch-heavy enough that inlining it into Janino
      * buys nothing). Output bytes still need lowercasing. */
    def clean(bytes: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(bytes.length)
      var needSep = false
      var t = 0
      while (t < bytes.length) {
        if (isHardSpace(bytes(t))) t += 1
        else {
          var end = t
          while (end < bytes.length && !isHardSpace(bytes(end))) end += 1
          // pass 1: truncate the token at the first URL occurrence
          val u = urlStart(bytes, t, end)
          val tokEnd = if (u >= 0) u else end
          // pass 2: drop the remainder iff '@' sits at an interior index
          var hasInteriorAt = false
          var i = t + 1
          while (i < tokEnd - 1 && !hasInteriorAt) {
            if (bytes(i) == '@') hasInteriorAt = true
            i += 1
          }
          if (!hasInteriorAt) {
            // pass 3 splits on control bytes; pass 4 collapses runs
            var segStart = t
            var j = t
            while (j <= tokEnd) {
              if (j == tokEnd || isCtrl(bytes(j))) {
                if (j > segStart) {
                  if (needSep) out.write(' ')
                  var prev: Int = -1
                  var k = segStart
                  while (k < j) {
                    val b = bytes(k)
                    if (!(b == prev && isRunPunct(b))) out.write(b)
                    prev = b
                    k += 1
                  }
                  needSep = true
                }
                segStart = j + 1
              }
              j += 1
            }
          }
          t = end
        }
      }
      out.toByteArray
    }
  }

  /** `clean_text(text)` — see [[CleanTextExpr]]. */
  def clean_text(text: Column): Column =
    ColumnBridge.column(CleanTextExpr(ColumnBridge.expression(text)))

}
