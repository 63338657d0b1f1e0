package graft

import graft.tools.GoldenStoreGen

/** Persisted-format compatibility gate. The committed golden store
  * (`src/test/resources/golden/v1` — written ONCE by the build that
  * defined v1, via `runMain graft.tools.GoldenStoreGen`) is read by
  * the CURRENT build's readers and compared against pinned canonical
  * hashes. At 100 TB the persisted artifacts (epoched tables, dedup
  * label/index stores, PQ indexes, sketch tables) outlive deploys —
  * rebuilding them on a format change costs corpus-scale compute, so
  * a format or read-semantics change MUST be a conscious decision:
  *
  *   - If this spec fails after a storage/layout/codec change, old
  *     stores in production would break or silently change meaning
  *     under the new build. Either restore compatibility, or
  *     regenerate the goldens as v2 AND document the migration story
  *     (what happens to existing v1 stores) in the commit.
  *   - The spec reads a COPY: some read paths are self-repairing
  *     (stranded-batch rescue, promotion) and may write; the
  *     committed bytes must stay pristine.
  *
  * The probe frames and read surface live in [[GoldenStoreGen]] —
  * one definition shared with the generator, so the comparison can
  * never drift from what was pinned.
  */
class GoldenFormatSpec extends SparkSuite {

  private val pinned: Map[String, (Long, String)] = Map(
    "epoched" -> (6L, "af2d8c2bdd93a5536bdf12ec449c926e5674bc8e454360de452ff074d7345ea6"),
    "labels" -> (60L, "a458af71f1fd944eb94686dc46521fa7815fd64afff973e1e169783fb2aea8d5"),
    "dedup_incremental" -> (12L, "602cc644ef8ab06ea388074af58554cb39e4c672d9ac18d64808a3ab31095877"),
    "pq_knn" -> (18L, "0ffff989548867b719aca2e1ebc6c58ff0d8d0cc706cc4fee32fe1fea2b84f31"),
    "sketches" -> (20L, "e73937f1798355cbe05e9f44660deafe33bc50bcb9a216d842607583e0596eb5"),
    "sketches_dashboard" -> (21L, "12ba430b25543d0b7c62c1af56066fed27cb5a22bb86b66f83a4cf9cf0976a73"))

  private val fixtureDir = "/root/testdata/sf0.001"

  test("the current build reads the committed v1 store byte-identically") {
    val src = new java.io.File("src/test/resources/golden/v1")
    assert(src.isDirectory, s"golden store missing at ${src.getAbsolutePath}")
    val tmp = java.nio.file.Files.createTempDirectory("graft-golden").toFile
    try {
      val work = new java.io.File(tmp, "v1")
      org.apache.commons.io.FileUtils.copyDirectory(src, work)
      val readers = GoldenStoreGen.readers(spark, work.toString, fixtureDir)
      // completeness: every pinned artifact read, every read pinned —
      // adding an artifact to the generator without pinning it here
      // (or vice versa) breaks the build instead of rotting silently
      assert(readers.map(_._1).sorted == pinned.keys.toSeq.sorted,
        "generator read surface and pinned hashes diverged")
      readers.foreach { case (name, rd) =>
        val df = rd()
        val (n, h) = GoldenStoreGen.canonicalHash(df)
        StorageHygiene.releaseAndSweep(spark, "golden-spec", name, Some(df))
        assert((n, h) == pinned(name),
          s"$name: persisted-format drift — read ($n, $h), pinned " +
            s"${pinned(name)}. If the at-rest format changed on purpose, " +
            "regenerate goldens as v2 WITH a migration story.")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }
}
