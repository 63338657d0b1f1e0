package graft.tools

// SCRATCH measurement harness (not part of the engine): same-JVM
// interleaved A/B of the r22 operator changes against verbatim
// reconstructions of the r21 shapes. Deleted after the round's
// measurements; methodology recorded in OPTIMIZATION_r22.md.

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ArrayHashExprs, TextFunctions}
import graft.operators.{Dedup, Similarity}

object AbMicro {
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = Similarity.DefaultPqM
    val ksub = Similarity.DefaultPqKsub
    val unit = Similarity.withUnit(
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select(col("vec_id"), col("unit"))
      .filter(col("unit").isNotNull)
    val dims = unit.select(size(col("unit"))).head().getInt(0)
    val dsub = dims / m

    // ---- trainer means, coarse: r21 posexplode vs r22 column-avgs
    val assignedC = unit.withColumn("cid",
      pmod(col("vec_id"), lit(16)).cast("int"))
    def oldCoarse = assignedC
      .select(col("cid"), posexplode(col("unit")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("col")).as("m"))
    def newCoarse = assignedC
      .groupBy(col("cid"))
      .agg((0 until dims).map(p =>
          avg(element_at(col("unit"), p + 1)).as(s"m$p")).head,
        (0 until dims).map(p =>
          avg(element_at(col("unit"), p + 1)).as(s"m$p")).tail: _*)

    // ---- trainer means, PQ: r21 double-generator vs r22 single
    val assignedP = unit.withColumn("codes", array((0 until m).map(mi =>
      pmod(col("vec_id") + mi, lit(ksub)).cast("int")): _*))
    def oldPq = assignedP
      .select(explode(array((0 until m).map(mi =>
        struct(lit(mi).as("mq"),
          element_at(col("codes"), mi + 1).as("cell"),
          slice(col("unit"), mi * dsub + 1, dsub).as("sub"))): _*)).as("e"))
      .select(col("e.mq"), col("e.cell"), posexplode(col("e.sub")))
      .groupBy(col("mq"), col("cell"), col("pos"))
      .agg(avg(col("col")).as("v"))
    def newPq = assignedP
      .select(explode(array((0 until m).map(mi =>
        struct(lit(mi).as("mq"),
          element_at(col("codes"), mi + 1).as("cell"),
          slice(col("unit"), mi * dsub + 1, dsub).as("sub"))): _*)).as("e"))
      .groupBy(col("e.mq").as("mq"), col("e.cell").as("cell"))
      .agg((0 until dsub).map(p =>
          avg(element_at(col("e.sub"), p + 1)).as(s"v$p")).head,
        (0 until dsub).map(p =>
          avg(element_at(col("e.sub"), p + 1)).as(s"v$p")).tail: _*)
    // alt: ONE posexplode of the raw unit, keys derived arithmetically —
    // no per-struct slice allocations, scalar agg like the r21 shape
    def altPq = assignedP
      .select(col("codes"), posexplode(col("unit")))
      .select(expr(s"pos div $dsub").cast("int").as("mq"),
        expr(s"pmod(pos, $dsub)").cast("int").as("p"),
        col("codes"), col("col"))
      .select(col("mq"), element_at(col("codes"), col("mq") + 1).as("cell"),
        col("p"), col("col"))
      .groupBy(col("mq"), col("cell"), col("p"))
      .agg(avg(col("col")).as("v"))

    // ---- sourceOverlap: r21 double-join vs r22 melt (both over the
    //      CURRENT minhash internals, isolating the melt change)
    def oldOverlap = {
      val src = docs.select(col("doc_id"), col("source"))
      Dedup.minhashPairsUnsorted(docs)
        .select(col("doc_a"), col("doc_b"))
        .join(src.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("source", "source_a"), Seq("doc_a"))
        .join(src.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("source", "source_b"), Seq("doc_b"))
        .groupBy(least(col("source_a"), col("source_b")).as("source_lo"),
          greatest(col("source_a"), col("source_b")).as("source_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_lo"), col("source_hi"))
    }
    def newOverlap = graft.operators.CorpusOps.sourceOverlap(docs)

    // ---- minhash candIds: r21 union-of-projections vs r22 explode
    //      (verbatim r21 minhashPairsUnsorted tail)
    def minhashWith(candIdsOf: DataFrame => DataFrame): DataFrame = {
      val bandedAll = Dedup.bandFrame(docs, 16, 4, 3)
        .repartition(col("band"), col("band_sig"))
      val banded = bandedAll
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_sig") === col("b.band_sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val candIds = candIdsOf(cand)
      val shCand = Dedup.shingleHashFrame(
        docs.join(candIds, Seq("doc_id"), "left_semi"), 3)
      cand
        .join(shCand.as("x"), col("doc_a") === col("x.doc_id"))
        .join(shCand.as("y"), col("doc_b") === col("y.doc_id"))
        .withColumn("inter",
          size(array_intersect(col("x.xs"), col("y.xs"))).cast("long"))
        .withColumn("jaccard",
          col("inter") / (size(col("x.xs")) + size(col("y.xs")) - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
    def oldMinhash = minhashWith(c =>
      c.select(col("doc_a").as("doc_id"))
        .union(c.select(col("doc_b").as("doc_id"))).distinct())
    def newMinhash = minhashWith(c =>
      c.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct())

    // ---- sharedSpans: r21 full-corpus frames vs r22 prune+checkpoint
    def oldShared = {
      val pairs = Dedup.minhashPairsUnsorted(docs, 16, 4, 0.5, 3)
        .select(col("doc_a"), col("doc_b"))
      val toksF = docs
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .withColumn("toks", split(col("norm"), " "))
      val tcnt = toksF.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"))
      val ps = toksF
        .select(col("doc_id"), posexplode(expr(
          """CASE WHEN size(toks) >= 3
            |THEN transform(sequence(1, size(toks) - 2),
            |       i -> array_join(slice(toks, i, 3), ' '))
            |ELSE array(array_join(toks, ' ')) END""".stripMargin)))
        .select(col("doc_id"), col("pos"),
          ArrayHashExprs.poly_hash31(col("col")).as("g"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
        .orderBy(col("pos_a"))
      pairs
        .join(ps.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
          col("g")), Seq("doc_a"))
        .join(ps.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
          col("g")), Seq("doc_b", "g"))
        .withColumn("diag", col("pos_a") - col("pos_b"))
        .withColumn("island", col("pos_a") - row_number().over(w))
        .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("island"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(sum(col("run_len")).as("n_matches"),
          max(col("run_len")).as("longest_run"))
        .join(tcnt.select(col("doc_id").as("doc_a"),
          col("n_toks").as("toks_a")), Seq("doc_a"))
        .join(tcnt.select(col("doc_id").as("doc_b"),
          col("n_toks").as("toks_b")), Seq("doc_b"))
        .withColumn("longest_span_tokens",
          least(col("longest_run") + lit(2).cast("long"),
            least(col("toks_a"), col("toks_b"))))
        .select(col("doc_a"), col("doc_b"), col("n_matches"),
          col("longest_run"), col("longest_span_tokens"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
    def newShared = Dedup.sharedSpans(docs)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "coarse_means_old" -> (() => oldCoarse),
      "coarse_means_new" -> (() => newCoarse),
      "pq_means_old" -> (() => oldPq),
      "pq_means_new" -> (() => newPq),
      "pq_means_alt" -> (() => altPq),
      "source_overlap_old" -> (() => oldOverlap),
      "source_overlap_new" -> (() => newOverlap),
      "minhash_old" -> (() => oldMinhash),
      "minhash_new" -> (() => newMinhash),
      "shared_spans_old" -> (() => oldShared),
      "shared_spans_new" -> (() => newShared))
    // warm every arm once (codegen), then interleave the timed reps so
    // machine drift hits old and new alike
    def sweep(df: DataFrame): Unit = {
      noop(df)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(df)
    }
    arms.foreach { case (_, f) => sweep(f()) }
    System.gc(); Thread.sleep(500)
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 0 until reps; (label, f) <- arms) {
      val t0 = System.nanoTime()
      sweep(f())
      val t = (System.nanoTime() - t0) / 1e9
      acc(label) = t :: acc.getOrElse(label, Nil)
    }
    arms.foreach { case (label, _) =>
      val ts = acc(label)
      println(f"AB $label%-24s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
