package graft

import graft.model.{PartitionStats, TopicSummary}
import graft.report.Report

/** Golden report test (SURVEY §5.2(4)) — the executable replacement for
  * the reference's demo_output.png: exact expected rendering for a
  * fixed input.
  */
class GoldenReportSpec extends SparkSuite {

  test("report renders the exact 15-column table") {
    val stats = Seq(
      PartitionStats(0, 0L, 3L, 3L, 2L, 1L, 100.0 / 3, 1L, 2L, 10L, 4L, 6L, 2L, 3L, 5L),
      PartitionStats(1, 0L, 1L, 1L, 1L, 0L, 0.0, 0L, 1L, 5L, 4L, 1L, 4L, 1L, 5L))
    val summary = TopicSummary(4L, 15L, 3L, 5L, 1000000L, 9000000L)
    val got = Report.render(stats, summary, "fixture", 2L, aliveKeys = Some(2L))
    val expectedTable =
      """+---+------+------+-------+-------+-----+---------+--------+---------+---------+---------+---------+--------+--------+--------+
        || P | < OS | > OS | Total | Alive | Tmb | DR      | K Null | K !Null | P-Bytes | K-Bytes | V-Bytes | A K-Sz | A V-Sz | A M-Sz |
        |+---+------+------+-------+-------+-----+---------+--------+---------+---------+---------+---------+--------+--------+--------+
        || 0 | 0    | 3    | 3     | 2     | 1   | 33.3333 | 1      | 2       | 10      | 4       | 6       | 2      | 3      | 5      |
        || 1 | 0    | 1    | 1     | 1     | 0   | 0.0000  | 0      | 1       | 5       | 4       | 1       | 4      | 1      | 5      |
        |+---+------+------+-------+-------+-----+---------+--------+---------+---------+---------+---------+--------+--------+--------+""".stripMargin
    assert(got.contains(expectedTable), s"table mismatch in:\n$got")
    assert(got.contains("Scanned messages: 4"))
    assert(got.contains("Estimated Msg/s: 2"))
    assert(got.contains("Alive keys: 2"))
    assert(got.contains("Earliest message: 1970-01-01T00:00:01Z"))
  }

  test("compat render matches the reference binary's layout exactly") {
    val stats = Seq(
      PartitionStats(0, 0L, 3L, 3L, 2L, 1L, 100.0 / 3, 1L, 2L, 10L, 4L, 6L, 2L, 3L, 5L))
    // 1_500_000 us = 1.5 s — compat must FLOOR to :01, not round
    val summary = TopicSummary(3L, 10L, 3L, 5L, 1500000L, 9000000L)
    val got = Report.renderCompat(stats, summary, "fixture", 2L,
      aliveKeys = Some(2L))
    val eq = "=" * 120
    val dash = "-" * 120
    val expected =
      s"""
         |$eq
         |Calculating statistics...
         |Topic fixture
         |Scanning took: 2 seconds
         |Estimated Msg/s: 1
         |$dash
         |Earliest Message: 1970-01-01 00:00:01 UTC
         |Latest Message: 1970-01-01 00:00:09 UTC
         |$dash
         |Largest Message: 5 bytes
         |Smallest Message: 3 bytes
         |Topic Size: 10 bytes
         |$dash
         |Alive keys: 2
         |$dash
         |$eq
         || K = Key, V = Value, P = Partition, Tmb = Tombstone(s), Sz = Size
         || DR = Dirty Ratio, A = Average, Lst = last, < OS = start offset, > OS = end offset
         |+---+------+------+-------+-------+-----+---------+--------+---------+---------+---------+---------+--------+--------+--------+
         || P | < OS | > OS | Total | Alive | Tmb | DR      | K Null | K !Null | P-Bytes | K-Bytes | V-Bytes | A K-Sz | A V-Sz | A M-Sz |
         |+---+------+------+-------+-------+-----+---------+--------+---------+---------+---------+---------+--------+--------+--------+
         || 0 | 0    | 3    | 3     | 2     | 1   | 33.3333 | 1      | 2       | 10      | 4       | 6       | 2      | 3      | 5      |
         |+---+------+------+-------+-------+-----+---------+--------+---------+---------+---------+---------+--------+--------+--------+
         |
         |$eq
         |""".stripMargin
    assert(got == expected,
      s"compat mismatch:\n--- got ---\n$got\n--- expected ---\n$expected")
  }
}
