package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSuite {

  test("applyMerge is greedy left-to-right (canonical BPE)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "a", "a")),
      (2L, Seq("a", "a", "a", "a")),
      (3L, Seq("b", "a", "a", "c")),
      (4L, Seq("a"))).toDF("id", "sym")
    val got = df.select(col("id"),
        BpeTrainer.applyMerge(col("sym"), "a", "a").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("aa", "a"))
    assert(got(2L) == List("aa", "aa"))
    assert(got(3L) == List("b", "aa", "c"))
    assert(got(4L) == List("a"))
  }

  test("classic Sennrich corpus learns the known first merges") {
    import spark.implicits._
    // low x5, lower x2, newest x6, widest x3 — the worked example from
    // the BPE paper. First merges: (e,s) 9, (es,t) 9, then the (l,o) /
    // (o,w) tie at 7 resolves lexicographically to (l,o), then (lo,w) 7.
    val wf = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val got = BpeTrainer.train(spark, wf, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("training stops early when no pairs remain") {
    import spark.implicits._
    val wf = Seq(("ab", 3L)).toDF("word", "freq")
    val got = BpeTrainer.train(spark, wf, k = 5).collect()
    assert(got.length == 1)
    assert((got(0).getString(1), got(0).getString(2)) == ("a", "b"))
  }

  test("best-pair counts are non-increasing across rounds") {
    import spark.implicits._
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, s"seq${i % 5} token${i % 7} shared common words here"))
      .toDF("doc_id", "text")
    val counts = BpeTrainer.trainOnCorpus(spark, docs, col("text"), k = 6)
      .orderBy("rank").collect().map(_.getLong(3)).toSeq
    assert(counts == counts.sorted.reverse, s"counts increased: $counts")
  }
}
