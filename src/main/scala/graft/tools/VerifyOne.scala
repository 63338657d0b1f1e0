package graft.tools

/** Single-query slice of [[graft.Verify]] for fast oracle iteration:
  * dumps the named queries' parquet + a filtered oracle_sql.json into
  * `outDir`, ready for `scripts/verify_local.py`. Pure delegation to
  * Verify's shared session/dump/escape helpers, so results are
  * comparable to the driver's gate by construction and the two
  * surfaces cannot drift.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <query...>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = graft.Verify.session()
    graft.Verify.dumpQueries(spark, sfDir, outDir, names)
    graft.Verify.dumpOracleSql(outDir, names)
    spark.stop()
    // same fired-guard surface as Verify.main (after stop(), so the
    // async listener bus has drained) — lets a single-query spill
    // iteration confirm its knobs fired without a full sweep
    println(s"VERIFY_SPILL mem=${graft.Verify.spilledMem.get()}" +
      s" disk=${graft.Verify.spilledDisk.get()}")
  }
}
