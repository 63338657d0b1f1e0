package graft

/** Whole-registry EXECUTION gate over an all-empty fixture — the
  * degenerate input a 100 TB deployment is guaranteed to feed every
  * operator eventually (an empty partition of a date-partitioned
  * corpus, a filter that matched nothing upstream, a brand-new topic).
  * [[QueryContractSpec]] proves every registered query ANALYZES
  * against the live fixture; this spec proves every one EXECUTES on
  * zero rows: an analytics query over an empty corpus must return an
  * empty (or identity-aggregate) result, never throw. The class of
  * bug it hunts is driver-side peeking at data-dependent state —
  * `.head()` on an empty stats frame, a max that came back null and
  * got unboxed, a seed book derived from no vectors — which
  * per-operator specs only catch for the operators someone thought to
  * probe, and which detonates in production as a crashed stage on the
  * one empty slice of ten thousand.
  *
  * The empty fixture is the LIVE sf0.001 schema with zero rows (each
  * table re-written via limit(0)), so schema drift in the driver's
  * generator propagates here automatically. Persisted-artifact
  * queries build their scratch stores FROM the empty fixture (the
  * scratch key embeds the data dir), so index build-on-empty and
  * probe-on-empty are both under the gate.
  */
class EmptyFixtureSpec extends SparkSuite {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every registered query EXECUTES on an all-empty fixture") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val dst = java.nio.file.Files.createTempDirectory("graft-empty").toString
    try {
      tables.foreach { t =>
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
          .limit(0).coalesce(1)
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      val broken = (SparkEntry.queries ++ SparkEntry.benchQueries)
        .toSeq.sortBy(_._1).flatMap { case (name, fn) =>
          var df: Option[org.apache.spark.sql.DataFrame] = None
          try {
            val d = fn(spark, dst); df = Some(d)
            d.collect() // EXECUTE, not just analyze
            StorageHygiene.releaseAndSweep(spark, "empty", name, df)
            None
          } catch {
            case e: Throwable =>
              StorageHygiene.releaseAndSweep(spark, "empty", name, df,
                cleanRun = false)
              Some(name -> Option(e.getMessage).flatMap(
                _.linesIterator.nextOption()).getOrElse(e.getClass.getName))
          }
        }
      assert(broken.isEmpty,
        s"${broken.size} queries crash on an empty corpus:\n" +
          broken.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
    }
  }
}
