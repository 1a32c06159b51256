package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private def positional(docs: (Long, Seq[String])*) =
    docs.flatMap { case (id, toks) =>
      toks.sliding(3).zipWithIndex.map { case (g, p) =>
        (id, p, g.mkString(" "))
      }
    }.toDF("id", "pos", "gram")

  test("the winnowing guarantee: a shared run of w+k-1 tokens always matches") {
    // k=3, w=4 → guarantee length 6. Doc 1 and 2 share exactly a 6-token
    // run embedded in otherwise-disjoint text; they MUST share >= 1
    // fingerprint no matter what the hashes are.
    val shared = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val d1 = Seq("one", "two", "three", "four") ++ shared ++ Seq("five", "six")
    val d2 = Seq("seven", "eight") ++ shared ++ Seq("nine", "ten", "eleven")
    val fps = Dedup.winnowFingerprints(positional(1L -> d1, 2L -> d2), w = 4)
    val pairs = Dedup.winnowOverlapPairs(fps, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      "guaranteed shared fingerprint missing")
  }

  test("disjoint-vocabulary docs share no fingerprints") {
    val d1 = (1 to 12).map(i => s"a$i")
    val d2 = (1 to 12).map(i => s"b$i")
    val fps = Dedup.winnowFingerprints(positional(1L -> d1, 2L -> d2), w = 4)
    assert(Dedup.winnowOverlapPairs(fps, minShared = 1).count() == 0)
  }

  test("tail windows shorter than w mint no fingerprints") {
    // 5 tokens → 3 grams → windows of 4 grams: none are full, so the
    // doc has NO fingerprints (the guarantee doesn't cover short docs)
    val fps = Dedup.winnowFingerprints(
      positional(1L -> Seq("p", "q", "r", "s", "t")), w = 4)
    assert(fps.count() == 0)
    // 6 tokens → 4 grams → exactly one full window → one fingerprint
    val one = Dedup.winnowFingerprints(
      positional(2L -> Seq("p", "q", "r", "s", "t", "u")), w = 4)
    assert(one.count() == 1)
  }
}
