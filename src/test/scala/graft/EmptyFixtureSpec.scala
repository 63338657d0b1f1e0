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

  /** Run every registered + bench-only query against `dir`, executing
    * (not just analyzing) each; returns (name, first error line) per
    * crash, releasing embedded checkpoint storage either way. */
  private def executeRegistry(dir: String): Seq[(String, String)] =
    (SparkEntry.queries ++ SparkEntry.benchQueries)
      .toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        var df: Option[org.apache.spark.sql.DataFrame] = None
        try {
          val d = fn(spark, dir); df = Some(d)
          d.collect()
          StorageHygiene.releaseAndSweep(spark, "degenerate", name, df)
          None
        } catch {
          case e: Throwable =>
            StorageHygiene.releaseAndSweep(spark, "degenerate", name, df,
              cleanRun = false)
            Some(name -> Option(e.getMessage).flatMap(
              _.linesIterator.nextOption()).getOrElse(e.getClass.getName))
        }
      }

  private def withNanosConf[A](body: => A): A = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("every registered query EXECUTES on an all-empty fixture") {
    val dst = java.nio.file.Files.createTempDirectory("graft-empty").toString
    try withNanosConf {
      tables.foreach { t =>
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
          .limit(0).coalesce(1)
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      val broken = executeRegistry(dst)
      assert(broken.isEmpty,
        s"${broken.size} queries crash on an empty corpus:\n" +
          broken.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dst))
  }

  test("every registered query EXECUTES when every payload column is null") {
    // the OTHER guaranteed-at-scale degenerate shape: a shard whose
    // rows exist but whose payloads are all null (a broken extractor
    // upstream, a schema-evolved column the old files lack). Keys stay
    // non-null — a null id is store corruption, which loud failure
    // serves better than tolerance — but every value-carrying column
    // of the LLM-pipeline tables is nulled: documents.text/lang/
    // source/n_chars, embeddings.embedding/label, events.ts/event_type/
    // value/props. TPC-H tables copy through unchanged (their
    // non-nullable relational semantics are the reference's contract,
    // and the DuckDB oracles assume it too).
    val nulled: Map[String, Set[String]] = Map(
      "documents" -> Set("text", "lang", "source", "n_chars"),
      "embeddings" -> Set("embedding", "label"),
      "events" -> Set("ts", "event_type", "value", "props"))
    val dst = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    try withNanosConf {
      tables.foreach { t =>
        val src = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        val out = nulled.get(t).fold(src) { cols =>
          src.select(src.columns.map(c =>
            if (cols(c))
              org.apache.spark.sql.functions.lit(null)
                .cast(src.schema(c).dataType).as(c)
            else org.apache.spark.sql.functions.col(c)): _*)
        }
        out.coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      val broken = executeRegistry(dst)
      assert(broken.isEmpty,
        s"${broken.size} queries crash on all-null payloads:\n" +
          broken.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dst))
  }
}
