package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class LanguageModelSpec extends SparkSuite {

  test("bigram NLL: hand-computed smoothing, unseen fallbacks, short docs") {
    import spark.implicits._
    // train: "a b" x2 and "a c" — counts c(a)=3, c(b)=2, c(c)=1;
    // bigrams c(a,b)=2, c(a,c)=1, c(b,a)=1 (from "a b a c"); V=3
    val train = Seq((1L, "a b"), (2L, "a b a c")).toDF("doc_id", "text")
    val (bigrams, unigrams, vocab) =
      LanguageModel.trainBigram(train, col("text"))
    assert(vocab == 3)
    val bg = bigrams.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))
    val ug = unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ug == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))

    // score: "a b" (seen bigram), "a z" (unseen bigram, seen context),
    // "z z" (unseen context), "a" (no bigrams -> NULL)
    val docs = Seq((10L, "a b"), (11L, "a z"), (12L, "z z"), (13L, "a"))
      .toDF("doc_id", "text")
    val out = LanguageModel.scoreBigram(docs, col("text"), bigrams, unigrams, vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    def nll(c2: Long, c1: Long): Double = -math.log((c2 + 1.0) / (c1 + 3.0))
    assert(out(10L) == ((1L, Some(nll(2, 3)))))   // (a,b): (2+1)/(3+3)
    assert(out(11L) == ((1L, Some(nll(0, 3)))))   // unseen bigram, c(a)=3
    assert(out(12L) == ((1L, Some(nll(0, 0)))))   // unseen context: 1/V
    assert(out(13L) == ((0L, None)))              // no bigram evidence

    // the model separates in-distribution text from shuffled junk on a
    // realistic slice: score two docs, one repeating trained bigrams,
    // one of unseen tokens — the junk must score strictly worse
    val probe = Seq((20L, "a b a b a b"), (21L, "q r s t u v"))
      .toDF("doc_id", "text")
    val scored = LanguageModel.scoreBigram(probe, col("text"), bigrams, unigrams, vocab)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(20L) < scored(21L))
  }
}
