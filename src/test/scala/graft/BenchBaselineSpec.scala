package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench v4 baseline parser: it must round-trip the exact
  * one-line artifact shape `Bench.main` emits, and degrade to None —
  * never throw — on anything else (missing file, partial artifact,
  * malformed JSON). A parse regression here silently disables the
  * suspect re-timing pass, so the shape is spec-pinned.
  */
class BenchBaselineSpec extends AnyFunSuite {

  private def withTemp(content: String)(f: String => Unit): Unit = {
    val p = Files.createTempFile("bench-baseline", ".json")
    try {
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      f(p.toString)
    } finally Files.delete(p)
  }

  test("round-trips the emitted artifact shape") {
    val line =
      """{"metric":"total","value":93.4,"unit":"sec","queries":{"q_agg":1.25,"q_knn":0.5,"q_neg":-1.0,"q_sci":1.2E-3},"sf":"/x","warmup":"/x","passes":2,"sweep":true,"leaked":0,"regime":"pass-major-rotate-v4","sentinel_s":0.129}"""
    withTemp(line) { path =>
      val Some((qs, sent, regime)) = Bench.loadBaseline(path)
      assert(sent == 0.129)
      assert(regime == "pass-major-rotate-v4")
      assert(qs == Map("q_agg" -> 1.25, "q_knn" -> 0.5, "q_neg" -> -1.0, "q_sci" -> 1.2e-3))
    }
    // a pre-regime artifact parses with an empty tag (never compared
    // raw against a tagged run — the caller's mismatch check handles it)
    withTemp("""{"queries":{"q":1.0},"sentinel_s":0.2}""") { p =>
      val Some((_, _, regime)) = Bench.loadBaseline(p)
      assert(regime == "")
    }
  }

  test("missing file, missing sentinel, empty queries, garbage → None") {
    assert(Bench.loadBaseline("/nonexistent/bench.json").isEmpty)
    withTemp("""{"queries":{"q":1.0}}""") { p =>
      assert(Bench.loadBaseline(p).isEmpty) // no sentinel
    }
    withTemp("""{"queries":{},"sentinel_s":0.1}""") { p =>
      assert(Bench.loadBaseline(p).isEmpty) // no queries
    }
    withTemp("not json at all") { p =>
      assert(Bench.loadBaseline(p).isEmpty)
    }
  }
}
