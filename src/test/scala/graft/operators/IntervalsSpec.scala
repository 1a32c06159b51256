package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  private def coalesced(rows: Seq[(String, Long, Long)]) =
    Intervals
      .coalesceIntervals(
        rows.toDF("k", "s", "e"), col("k"), col("s"), col("e"))
      .as[(String, Long, Long, Long)]
      .collect()
      .sortBy(r => (r._1, r._2))
      .toSeq

  test("overlapping and touching spans merge; gapped spans do not") {
    val out = coalesced(Seq(
      ("a", 0L, 10L),   // overlaps next
      ("a", 5L, 12L),   // extends island
      ("a", 12L, 15L),  // touching (start == running max) — merged
      ("a", 17L, 20L),  // strict gap — new island
      ("b", 3L, 4L)))
    assert(out == Seq(
      ("a", 0L, 15L, 3L),
      ("a", 17L, 20L, 1L),
      ("b", 3L, 4L, 1L)))
  }

  test("a span swallowed by an earlier long span cannot split the island") {
    // [0,100] then [10,20] then [30,40]: naive lag(e) comparison sees
    // 30 > 20 and wrongly opens a new island; the running MAX does not.
    val out = coalesced(Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 30L, 40L)))
    assert(out == Seq(("k", 0L, 100L, 3L)))
  }

  test("duplicate spans and tie order are deterministic") {
    val out = coalesced(Seq(
      ("k", 1L, 5L), ("k", 1L, 5L), ("k", 1L, 3L), ("k", 6L, 7L)))
    assert(out == Seq(("k", 1L, 5L, 3L), ("k", 6L, 7L, 1L)))
  }

  test("islands match a brute-force transitive-overlap closure") {
    // md5-deterministic fixture: 400 spans across 5 keys; compare against
    // an O(n²) reachability closure computed on the driver.
    val fixture = (0 until 400).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"iv$i".getBytes("UTF-8"))
      val k = s"k${(h(0) & 0x7f) % 5}"
      val s = ((h(1) & 0xff) * 4 + (h(2) & 0x03)).toLong
      val len = ((h(3) & 0x0f) + 1).toLong
      (k, s, s + len)
    }
    val got = coalesced(fixture)
    val expected = fixture.groupBy(_._1).toSeq.flatMap { case (k, spans) =>
      val sorted = spans.map(t => (t._2, t._3)).sorted
      val islands = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)]
      for ((s, e) <- sorted) {
        if (islands.nonEmpty && s <= islands.last._2) {
          val (is, ie, n) = islands.last
          islands(islands.size - 1) = (is, math.max(ie, e), n + 1)
        } else islands += ((s, e, 1L))
      }
      islands.map(t => (k, t._1, t._2, t._3))
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
  }
}
