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
    "epoched" -> (6L, "ccd019ae143e0352f9f72049373fd1cc84b30ec4f06e4d3df617c9af5f140c59"),
    "labels" -> (60L, "2332b82d089a6579031afd7f197a58cb4e9f9a41c57c053cb1aba5dfef32b06b"),
    "dedup_incremental" -> (12L, "e6029ab06b9596be64400451579b9652f02073ea269fa8082e7a58c84f75d8ee"),
    "pq_knn" -> (18L, "159d71bb790b8dc4edab2c4159d419081b8854e92bb3a733221e4e3c23d99978"),
    "sketches" -> (20L, "a51e8b655485acb23c92758cead5eef416e290be79be9e8dfd73b415e5255b87"),
    "sketches_dashboard" -> (21L, "f0540268aaf457a2cdb282e12230408b207efa4ef5edc696c9d60bf66b7d704d"))

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
