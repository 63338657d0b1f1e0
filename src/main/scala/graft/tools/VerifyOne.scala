package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query slice of [[graft.Verify]] for fast oracle iteration:
  * dumps ONE query's parquet + a one-entry oracle_sql.json into
  * `outDir`, ready for `scripts/verify_local.py`. Same session config
  * as Verify so results are comparable to the driver's gate.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <query...>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      var df: Option[org.apache.spark.sql.DataFrame] = None
      val ok =
        try {
          val d = graft.SparkEntry.queries(name)(spark, sfDir); df = Some(d)
          d.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name"); true
        } catch { case e: Throwable =>
          System.err.println(s"[verify-one] $name failed: ${e.getMessage}")
          false
        }
      graft.StorageHygiene.releaseAndSweep(spark, "verify", name, df, ok)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    val sqls = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"),
      sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ", ", "}")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
