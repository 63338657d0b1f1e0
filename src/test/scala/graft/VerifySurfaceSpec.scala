package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Verify]]'s driver-facing artifact surface. `oracle_sql.json`
  * is the one file the driver `json.load`s to run the correctness
  * gate: an escaping bug there doesn't fail a query, it silently
  * ZEROES the whole round's correctness (the scaladoc's own warning —
  * until now untested). A strict in-test JSON string parser (throws on
  * raw control chars, bad escapes, trailing garbage) round-trips both
  * a pathological corpus and the REAL 141-entry artifact.
  */
class VerifySurfaceSpec extends AnyFunSuite {

  /** Strict parser for the exact shape dumpOracleSql emits:
    * a flat string→string JSON object. Intentionally unforgiving —
    * anything Python's json.load would reject must throw HERE. */
  private def parseFlatStringMap(json: String): Map[String, String] = {
    var i = 0
    def ws(): Unit = while (i < json.length && json(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws(); require(json(i) == c, s"expected '$c' at $i, got '${json(i)}'")
      i += 1
    }
    def str(): String = {
      ws(); require(json(i) == '"', s"expected string at $i"); i += 1
      val sb = new StringBuilder
      while (json(i) != '"') {
        val c = json(i)
        require(c >= ' ', s"raw control char ${c.toInt} at $i — invalid JSON")
        if (c == '\\') {
          i += 1
          json(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => sys.error(s"bad escape \\$other at $i")
          }
        } else sb += c
        i += 1
      }
      i += 1
      sb.toString
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    expect('{'); ws()
    if (json(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        val k = str(); expect(':'); val v = str()
        out(k) = v
        ws()
        if (json(i) == ',') i += 1
        else { expect('}'); more = false }
      }
    }
    ws(); require(i == json.length, "trailing garbage after the object")
    out.toMap
  }

  test("jsonEscape round-trips a pathological corpus through strict parsing") {
    val corpus = Seq(
      "", "plain", "quote\"inside", "back\\slash", "tab\there",
      "newline\nhere", "cr\rhere", "\u0000nul", "\u0001\u001f edges",
      "slash/es are legal raw", "unicode é ü λ", "emoji 🎉",
      "all: \"\\\n\r\t\u0002 end")
    corpus.foreach { s =>
      val escaped = Verify.jsonEscape(s)
      // no raw control char may survive into the artifact — every
      // escape sequence is printable ASCII, so the whole escaped
      // string must be >= 0x20
      assert(escaped.forall(_ >= ' '),
        s"raw control char leaked: $escaped")
      val back = parseFlatStringMap(s"""{"k": $escaped}""")("k")
      assert(back == s, s"round-trip broke: '$s' -> $escaped -> '$back'")
    }
  }

  test("the REAL oracle_sql.json artifact parses back to the exact oracle map") {
    val dir = java.nio.file.Files.createTempDirectory("graft-oracle-json")
    try {
      Verify.dumpOracleSql(dir.toString)
      val text = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/oracle_sql.json"))
      // strict parse: any raw control char a builder-authored SQL
      // smuggled in (the tab/CR failure the escaper exists for) throws
      val parsed = parseFlatStringMap(text)
      assert(parsed == SparkEntry.oracleSql,
        "the artifact does not round-trip to the oracle map")
      assert(parsed.size == SparkEntry.oracleSql.size)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(dir.toFile)
  }
}
