package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Exact-parity gate for the distributed BPE trainer: the merge
  * sequence must equal an independently-written single-machine
  * reference trainer (same sliding pair counts, same
  * (weight desc, left, right) tie-break, same greedy left-to-right
  * application) on the same word counts. This stands in for the SQL
  * oracle the iterative argmax loop cannot have.
  */
class BpeSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Reference trainer over a word→count dictionary. */
  private def refBpe(words: Map[String, Long],
      k: Int): List[(String, String, Long)] = {
    var ws: Map[List[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toList -> c }
    val out = List.newBuilder[(String, String, Long)]
    var done = false
    var round = 0
    while (round < k && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      ws.foreach { case (syms, c) =>
        syms.lazyZip(syms.drop(1)).foreach((a, b) => counts((a, b)) += c)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), w) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, w))
        def mergeWord(s: List[String]): List[String] =
          s.foldLeft(List.empty[String]) { (acc, sym) =>
            acc match {
              case init :+ last if last == l && sym == r => init :+ (l + r)
              case _ => acc :+ sym
            }
          }
        ws = ws.map { case (s, c) => mergeWord(s) -> c }
        round += 1
      }
    }
    out.result()
  }

  /** The engine's own word counts (same tokenization). */
  private def wordCounts(d: DataFrame): Map[String, Long] =
    rowsOf(d.select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("c")))
      .map(m => m("w").asInstanceOf[String] -> m("c").asInstanceOf[Long])
      .toMap

  test("trainMerges matches the single-machine reference trainer") {
    val d = docs(
      1L -> "low lower lowest low low",
      2L -> "new newer newest new wide widest wider",
      3L -> "low and wide and new and newer")
    val got = Bpe.trainMerges(d, 12)
    val ref = refBpe(wordCounts(d), 12)
    assert(got.map(m => (m.left, m.right, m.weight)) == ref)
    assert(got.map(_.rank) == got.indices)
  }

  test("greedy left-to-right: overlapping runs, then exhaustion") {
    // "aaa": round 1 counts the sliding (a,a) twice per word (weight
    // 4), merges greedily to [aa, a]; round 2 merges (aa, a); then no
    // pairs remain and the trainer stops early
    val r = Bpe.trainMerges(docs(1L -> "aaa aaa"), 10)
    assert(r.map(m => (m.left, m.right, m.weight)) ==
      Seq(("a", "a", 4L), ("aa", "a", 2L)))
  }

  test("deep walk: a 200-merge request runs to vocab exhaustion; prefixes are stable") {
    // the O(numMerges) driver-rounds bound is a LINEAR walk (measured
    // flat per-round in tools.BpeTrainBench): pin the two properties
    // that make that statement meaningful — a request far beyond the
    // vocabulary stops early at exhaustion with full reference parity,
    // and a shorter run is exactly the longer run's prefix (rounds are
    // independent of the requested total, so per-round cost cannot
    // secretly depend on numMerges)
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog near the river",
      2L -> "pack my box with five dozen liquor jugs for the long trip",
      3L -> "the dog and the fox trade long looks over the quiet river")
    val full = Bpe.trainMerges(d, 200)
    assert(full.nonEmpty && full.size < 200,
      s"expected early exhaustion, learned ${full.size}")
    assert(full.map(m => (m.left, m.right, m.weight)) ==
      refBpe(wordCounts(d), 200))
    assert(Bpe.trainMerges(d, 10) == full.take(10))
  }

  test("mergesFrame emits rank-ordered merges with concatenated symbol") {
    val rows = rowsOf(Bpe.mergesFrame(docs(1L -> "ab ab abc"), 5))
    assert(rows.map(_("rank")) == rows.indices)
    rows.foreach { m =>
      assert(m("merged") == s"${m("left")}${m("right")}")
    }
    // (a,b) dominates: weight 3 (one per word occurrence)
    assert(rows.head("left") == "a" && rows.head("right") == "b" &&
      rows.head("weight") == 3L)
  }

  test("training leaves no persisted word-table checkpoints behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Bpe.trainMerges(docs(1L -> "clean up after yourself"), 4)
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }

  test("encodeCounts matches the reference encoder and its invariants") {
    val d = docs(
      1L -> "low lower lowest low low",
      2L -> "new newer newest new wide widest wider",
      3L -> "low and wide and new and newer")
    val merges = Bpe.trainMerges(d, 8)
    val got = rowsOf(Bpe.encodeCounts(d, merges))
      .map(m => m("doc_id") -> (m("n_words"), m("n_pieces"))).toMap

    // reference encode: same greedy fold per word, merges in rank order
    def seg(word: String): Int = {
      var syms = word.map(_.toString).toList
      merges.foreach { m =>
        syms = syms.foldLeft(List.empty[String]) { (acc, s) =>
          acc match {
            case init :+ last if last == m.left && s == m.right =>
              init :+ (m.left + m.right)
            case _ => acc :+ s
          }
        }
      }
      syms.size
    }
    val perDoc = Map(
      1L -> "low lower lowest low low",
      2L -> "new newer newest new wide widest wider",
      3L -> "low and wide and new and newer")
    perDoc.foreach { case (id, text) =>
      val words = text.split(" ").toSeq
      assert(got(id) == (words.size.toLong,
        words.map(seg).sum.toLong), s"doc $id")
    }

    // zero merges degenerate to character counts; merges only shrink
    val zero = rowsOf(Bpe.encodeCounts(d, Nil))
      .map(m => m("doc_id") -> m("n_pieces")).toMap
    perDoc.foreach { case (id, text) =>
      assert(zero(id) == text.split(" ").map(_.length).sum.toLong)
    }
    got.foreach { case (id, (_, pieces)) =>
      assert(pieces.asInstanceOf[Long] <= zero(id).asInstanceOf[Long])
    }
  }

  test("encodePinnedQuery matches the reference fold under PinnedMerges") {
    // the q_bpe_encode surface: FIXED shipped merge table, no training
    val d = docs(
      1L -> "the batch scanner joins sorted rows in order",
      2L -> "hash join over a scan of the sorted window",
      3L -> "aaa aaaa batch batch hash")
    val got = rowsOf(Bpe.encodePinnedQuery(d))
      .map(m => m("doc_id") -> (m("n_words"), m("n_pieces"))).toMap
    def seg(word: String): Int = {
      var syms = word.map(_.toString).toList
      Bpe.PinnedMerges.foreach { m =>
        syms = syms.foldLeft(List.empty[String]) { (acc, s) =>
          acc match {
            case init :+ last if last == m.left && s == m.right =>
              init :+ (m.left + m.right)
            case _ => acc :+ s
          }
        }
      }
      syms.size
    }
    Map(
      1L -> "the batch scanner joins sorted rows in order",
      2L -> "hash join over a scan of the sorted window",
      3L -> "aaa aaaa batch batch hash"
    ).foreach { case (id, text) =>
      val words = text.split(" ").toSeq
      assert(got(id) == (words.size.toLong, words.map(seg).sum.toLong),
        s"doc $id: got ${got(id)}")
    }
    // the pinned table is rank-dense from 0 — the oracle replays it
    // positionally, so a gap would silently skip a merge
    assert(Bpe.PinnedMerges.map(_.rank) == Bpe.PinnedMerges.indices)
  }

  test("tokenizerFit: zero merges is the 1.0 ceiling, pinned merges compress") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "the batch scanner sorts rows", "a"),
      (2L, "joins over sorted batches in order", "a"),
      (3L, "zzz qqq xxx vvv kkk", "b")) // no pinned merge applies
      .toDF("doc_id", "text", "source")
    // zero merges: every piece is one character
    val zero = rowsOf(Bpe.tokenizerFit(d, Nil))
    zero.foreach { r =>
      assert(r("n_pieces") == r("n_chars"), s"zero-merge row: $r")
      assert(r("pieces_per_mchar") == 1000000L)
    }
    val fit = rowsOf(Bpe.tokenizerFit(d)).map(r =>
      r("source") -> r("pieces_per_mchar").asInstanceOf[Long]).toMap
    // source a contains trained-distribution text -> compresses;
    // source b shares no merge pair -> stays at the ceiling
    assert(fit("a") < 1000000L, s"fit: $fit")
    assert(fit("b") == 1000000L, s"fit: $fit")
  }
}
