package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class SuffixArrayDedupSpec extends AnyFunSuite {

  private def naiveSa(t: Array[Int]): Array[Int] =
    Array.range(0, t.length).sortWith { (a, b) =>
      val s1 = t.drop(a).toSeq; val s2 = t.drop(b).toSeq
      import scala.math.Ordering.Implicits._
      s1 < s2
    }

  test("suffix array and LCP match naive construction on fuzzed arrays") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(60)
      val t = Array.fill(n)(rnd.nextInt(4))
      val sa = SuffixArrayDedup.suffixArray(t)
      assert(sa.toSeq == naiveSa(t).toSeq, s"trial $trial: ${t.mkString(",")}")
      val lcp = SuffixArrayDedup.lcpArray(t, sa)
      for (j <- 1 until n) {
        val a = t.drop(sa(j - 1)); val b = t.drop(sa(j))
        val expect = a.zip(b).takeWhile { case (x, y) => x == y }.length
        assert(lcp(j) == expect, s"trial $trial lcp at $j")
      }
    }
  }

  /** Naive coverage: position p of doc d is duplicated iff some L-window
    * covering p occurs ≥ 2 times across the shard (any doc, any pos). */
  private def naiveStats(
      docs: Seq[(Long, Seq[String])], l: Int): Seq[(Long, Int, Int)] = {
    val grams = scala.collection.mutable.Map.empty[Seq[String], Int]
    docs.foreach { case (_, ws) =>
      ws.sliding(l).filter(_.size == l).foreach(g =>
        grams(g) = grams.getOrElse(g, 0) + 1)
    }
    docs.map { case (id, ws) =>
      val repStarts = (0 to ws.size - l)
        .filter(s => ws.size >= l && grams(ws.slice(s, s + l)) >= 2)
      val covered = repStarts.flatMap(s => s until s + l).distinct.size
      (id, ws.size, covered)
    }
  }

  test("shard stats equal the gram-window replay on fuzzed shards") {
    val rnd = new scala.util.Random(11)
    val vocabulary = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 30) {
      val docs = (1L to (2 + rnd.nextInt(5)).toLong).map { id =>
        id -> Seq.fill(rnd.nextInt(40))(vocabulary(rnd.nextInt(vocabulary.size)))
      }
      val l = 2 + rnd.nextInt(4)
      val got = SuffixArrayDedup.shardStats(docs, l).sortBy(_._1)
      val want = naiveStats(docs, l).sortBy(_._1)
      assert(got == want, s"trial $trial l=$l")
    }
  }

  test("planted cross-doc duplicate is fully covered; sentinels isolate docs") {
    val passage = (1 to 10).map(i => s"w$i")
    val a = 1L -> (Seq("x", "y") ++ passage)
    val b = 2L -> (passage ++ Seq("z"))
    val c = 3L -> Seq("unrelated", "words", "only")
    val got = SuffixArrayDedup.shardStats(Seq(a, b, c), 10).sortBy(_._1)
    assert(got == Seq((1L, 12, 10), (2L, 11, 10), (3L, 3, 0)))
    // a doc ENDING where another begins must not match across the
    // sentinel: these share no 3-window, despite adjacency in the
    // concatenated sequence
    val d = Seq(10L -> Seq("p", "q", "r"), 11L -> Seq("r", "p", "q"))
    assert(SuffixArrayDedup.shardStats(d, 3).forall(_._3 == 0))
  }
}
