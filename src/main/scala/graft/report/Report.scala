package graft.report

import graft.model.{PartitionStats, TopicSummary}

/** Console report renderer — reproduces the reference's output contract
  * (`src/main.rs:123-179`): global summary lines, the 15-column
  * per-partition table (headers at `src/main.rs:150,153-172`), legend,
  * and `%.4f`-formatted dirty ratio. Pure string formatting over the
  * already-collected O(#partitions) result — no query logic here.
  */
object Report {

  val Headers: Seq[String] = Seq(
    "P", "< OS", "> OS", "Total", "Alive", "Tmb", "DR",
    "K Null", "K !Null", "P-Bytes", "K-Bytes", "V-Bytes",
    "A K-Sz", "A V-Sz", "A M-Sz")

  def render(stats: Seq[PartitionStats], summary: TopicSummary,
      topic: String, elapsedSecs: Long,
      aliveKeys: Option[Long] = None): String = {
    val sb = new StringBuilder
    val rule = "=" * 120
    sb.append(rule).append('\n')
    sb.append(s"Topic: $topic\n")
    sb.append(s"Scanned messages: ${summary.overall_count}\n")
    sb.append(s"Overall size: ${summary.overall_bytes} bytes\n")
    sb.append(s"Smallest message: ${summary.smallest_msg} bytes\n")
    sb.append(s"Largest message: ${summary.largest_msg} bytes\n")
    sb.append(s"Earliest message: ${fmtTs(summary.earliest_us)}\n")
    sb.append(s"Latest message: ${fmtTs(summary.latest_us)}\n")
    val msgsPerSec = summary.overall_count / math.max(elapsedSecs, 1L)
    sb.append(s"Estimated Msg/s: $msgsPerSec\n")
    aliveKeys.foreach(n => sb.append(s"Alive keys: $n\n"))
    sb.append(rule).append('\n')
    sb.append(table(stats)).append('\n')
    sb.append("Legend: P=Partition, OS=Offset, Tmb=Tombstones, ")
      .append("DR=Dirty Ratio (tombstone %), K=Key, V=Value, ")
      .append("A=Average, Sz=Size, Bytes are key+value payload bytes\n")
    sb.toString
  }

  private def fmtTs(us: Long): String =
    java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
      .toString

  /** Reference-fidelity render (`src/main.rs:123-179`): same line order,
    * separators, legend text, and prettytable-style grid as the
    * reference binary, with timestamps truncated to seconds the way its
    * `NaiveDateTime::from_timestamp(ms / 1000, 0)` does
    * (`src/metric.rs:210-211`) and displayed like chrono's
    * `DateTime<Utc>` ("yyyy-MM-dd HH:mm:ss UTC").
    */
  def renderCompat(stats: Seq[PartitionStats], summary: TopicSummary,
      topic: String, elapsedSecs: Long,
      aliveKeys: Option[Long] = None): String = {
    val sb = new StringBuilder
    val eq = "=" * 120
    val dash = "-" * 120
    sb.append('\n')
    sb.append(eq).append('\n')
    sb.append("Calculating statistics...\n")
    sb.append(s"Topic $topic\n")
    sb.append(s"Scanning took: $elapsedSecs seconds\n")
    sb.append(s"Estimated Msg/s: ${summary.overall_count / math.max(elapsedSecs, 1L)}\n")
    sb.append(dash).append('\n')
    sb.append(s"Earliest Message: ${fmtTsCompat(summary.earliest_us)}\n")
    sb.append(s"Latest Message: ${fmtTsCompat(summary.latest_us)}\n")
    sb.append(dash).append('\n')
    sb.append(s"Largest Message: ${summary.largest_msg} bytes\n")
    sb.append(s"Smallest Message: ${summary.smallest_msg} bytes\n")
    sb.append(s"Topic Size: ${summary.overall_bytes} bytes\n")
    aliveKeys.foreach { n =>
      sb.append(dash).append('\n')
      sb.append(s"Alive keys: $n\n")
      sb.append(dash).append('\n')
    }
    sb.append(eq).append('\n')
    sb.append("| K = Key, V = Value, P = Partition, Tmb = Tombstone(s), Sz = Size\n")
    sb.append("| DR = Dirty Ratio, A = Average, Lst = last, < OS = start offset, > OS = end offset\n")
    sb.append(compatTable(stats)).append('\n')
    sb.append('\n')
    sb.append(eq).append('\n')
    sb.toString
  }

  private val CompatTsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss 'UTC'")
    .withZone(java.time.ZoneOffset.UTC)

  /** Seconds-truncated (floor of us→ms→s, like the reference's integer
    * division chain) timestamp in chrono `DateTime<Utc>` display form. */
  private def fmtTsCompat(us: Long): String =
    CompatTsFmt.format(java.time.Instant.ofEpochSecond(us / 1000000L))

  /** The 15 table cells for one partition row. Locale.ROOT on the
    * dirty-ratio format: the reference always prints '.', so a
    * locale-sensitive interpolator would break byte fidelity on
    * non-English-locale JVMs. */
  private def cells(s: PartitionStats): Seq[String] = Seq(
    s.partition.toString, s.start_offset.toString, s.end_offset.toString,
    s.total.toString, s.alive.toString, s.tombstones.toString,
    String.format(java.util.Locale.ROOT, "%.4f",
      Double.box(s.dirty_ratio)),
    s.key_null.toString, s.key_non_null.toString,
    s.p_bytes.toString, s.key_bytes.toString, s.value_bytes.toString,
    s.avg_key_size.toString, s.avg_value_size.toString,
    s.avg_msg_size.toString)

  /** prettytable-rs FORMAT_DEFAULT: '+' junctions, '-' fills, a
    * separator line around every row, one-space cell padding,
    * left-aligned; the header is just the first row. */
  private def compatTable(stats: Seq[PartitionStats]): String = {
    val rows = Headers +: stats.map(cells)
    val widths = Headers.indices.map(i => rows.map(_(i).length).max)
    val sep = widths.map(w => "-" * (w + 2)).mkString("+", "+", "+")
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => " " + c.padTo(w, ' ') + " " }
        .mkString("|", "|", "|")
    (sep +: rows.flatMap(r => Seq(line(r), sep))).mkString("\n")
  }

  private def table(stats: Seq[PartitionStats]): String = {
    val rows = stats.map(cells)
    val widths = Headers.indices.map(i =>
      (Headers(i).length +: rows.map(_(i).length)).max)
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(sep, line(Headers), sep) ++ rows.map(line) :+ sep).mkString("\n")
  }
}
