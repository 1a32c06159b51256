package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val words =
    TextAnalysis.words(TextAnalysis.normalize(col("text")))

  test("phrase search counts overlapping occurrences at exact positions") {
    val d = docs(
      1L -> "a b c a b c a b",
      2L -> "a b x c",
      3L -> "c b a",
      4L -> "a b c")
    val got = InvertedIndex.phraseMatches(
        InvertedIndex.postings(d, col("doc_id"), words), Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L))
  }

  test("single-term phrase degenerates to term occurrence count") {
    val d = docs(1L -> "x y x x", 2L -> "y")
    val got = InvertedIndex.phraseMatches(
        InvertedIndex.postings(d, col("doc_id"), words), Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L))
  }

  test("bm25: rarer query term outweighs common one at equal tf") {
    // 'rare' in 1 of 10 docs, 'common' in 9 of 10; doc 1 has rare,
    // doc 2 has common, identical lengths
    val filler = (1 to 8).map(i => i.toLong + 2L -> s"pad$i word$i common")
    val d = docs(Seq(1L -> "rare alpha beta", 2L -> "common alpha beta") ++ filler: _*)
    val top = InvertedIndex.bm25TopK(d, col("doc_id"), words,
        Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(top.head._1 == 1L, s"rare-term doc should rank first: ${top.toSeq}")
    assert(top.map(_._3).toSeq == (1 to top.length).toSeq)
  }

  test("bm25: higher tf wins within one term at equal length") {
    val d = docs(
      1L -> "t t t x",
      2L -> "t x y z",
      3L -> "a b c d")
    val top = InvertedIndex.bm25TopK(d, col("doc_id"), words, Seq("t"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L)) // doc 3 has no query term: absent
  }

  test("incremental index merge equals the from-scratch build") {
    val d = docs(
      1L -> "alpha beta gamma alpha",
      2L -> "beta delta",
      3L -> "gamma gamma epsilon",
      4L -> "alpha zeta")
    val full = InvertedIndex.buildIndex(d, col("doc_id"), words)
    val merged = InvertedIndex.mergeIndex(
      InvertedIndex.buildIndex(d.filter(col("doc_id") <= 2), col("doc_id"), words),
      InvertedIndex.buildIndex(d.filter(col("doc_id") > 2), col("doc_id"), words))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(merged.postings) == rows(full.postings))
    assert(rows(merged.docLen) == rows(full.docLen))
    assert(rows(merged.termDf) == rows(full.termDf))
    assert(rows(merged.corpusStats) == rows(full.corpusStats))
    // and the scores agree with the one-shot path
    val a = InvertedIndex.bm25FromIndex(merged, Seq("alpha", "gamma"), k = 10)
      .collect().map(_.toSeq).toSeq
    val b = InvertedIndex.bm25TopK(d, col("doc_id"), words,
      Seq("alpha", "gamma"), k = 10).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("empty documents contribute no postings but count toward N") {
    val d = docs(1L -> "t u v", 2L -> "", 3L -> "t")
    assert(InvertedIndex.postings(d, col("doc_id"), words)
      .filter(col("id") === 2L).count() == 0)
    val top = InvertedIndex.bm25TopK(d, col("doc_id"), words, Seq("t"), k = 5)
    assert(top.count() == 2)
  }
}
