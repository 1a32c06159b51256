package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The pluggable scoring contract: the default impls must agree with the
  * TextAnalysis stand-ins (so every existing oracle still binds), and a
  * model-backed function must slot into an unchanged caller.
  */
class TextScoringSpec extends SparkSuite {

  test("hashed classifier: partition-order-independent scores, stable buckets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "a completely different document with other words entirely"),
      (3L, "the cat sat on the mat and the cat ran"), // dup of 1
      (4L, "word")) // single word: no bigram features
      .toDF("doc_id", "text")
    val weights = spark.range(0, 256).select(
      col("id").as("bucket"),
      ((col("id") * lit(2654435761L)) % 2001 - 1000).cast("double")
        ./(lit(1000.0)).as("weight"))
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      HashedClassifier.score(
        HashedClassifier.features(df, col("doc_id"), col("text"), 2, 256),
        weights, bias = -0.1)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s1 = scores(docs.repartition(1))
    val s7 = scores(docs.repartition(7))
    // DECIMAL accumulation: the logit cannot depend on partitioning
    assert(s1 == s7, "scores changed under repartitioning")
    // identical text -> identical score; sigmoid stays in (0,1)
    assert(s1(1L) == s1(3L))
    assert(s1.values.forall(v => v > 0.0 && v < 1.0))
    // sub-n docs contribute no features (caller's policy decides them)
    assert(!s1.contains(4L))
  }

  test("canonicalizeUrl: case, ports, fragments, tracking params, param order") {
    import spark.implicits._
    def canon(url: String): String =
      Seq(url).toDF("u")
        .select(TextAnalysis.canonicalizeUrl(col("u")).as("c"))
        .first().getString(0)
    // the classic same-page variants collapse
    assert(canon("HTTP://Example.COM:80/a?utm_source=x&b=1#frag") ==
      "http://example.com/a?b=1")
    assert(canon("http://example.com/a?b=1") == "http://example.com/a?b=1")
    // param ORDER normalizes; tracking params go, real ones stay
    assert(canon("https://h.org/p?z=9&a=1&utm_medium=m&fbclid=f&gclid=g") ==
      "https://h.org/p?a=1&z=9")
    // default port strips ONLY for its own scheme
    assert(canon("https://h.org:443/p") == "https://h.org/p")
    assert(canon("https://h.org:80/p") == "https://h.org:80/p")
    assert(canon("http://h.org:8080/p") == "http://h.org:8080/p")
    // path case is PRESERVED (case-sensitive), host case is not
    assert(canon("http://H.org/CaseSensitive") == "http://h.org/CaseSensitive")
    // empty path normalizes to /; all-tracking query drops entirely
    assert(canon("http://h.org?utm_source=x") == "http://h.org/")
    assert(canon("http://h.org") == "http://h.org/")
    // a param NAMED like but not equal to a tracking prefix survives
    assert(canon("http://h.org/p?utmx=1&gclid2=3") ==
      "http://h.org/p?gclid2=3&utmx=1")
    // the q120 fixture shape verbatim
    assert(canon("HTTP://ExAmple.COM:80/Path0/Item?utm_source=x&b=2&a=1&gclid=zzz") ==
      "http://example.com/Path0/Item?a=1&b=2")
  }

  test("htmlToText: scripts/styles/comments drop with content, entities decode, blocks break lines") {
    import spark.implicits._
    def strip(html: String): String =
      Seq(html).toDF("h")
        .select(TextAnalysis.htmlToText(col("h")).as("t"))
        .first().getString(0)
    assert(strip("<html><head><title>T</title>" +
      "<style>p{color:red}</style><script>if(1<2){alert('x')}</script></head>" +
      "<body><h1>Head</h1><!-- secret --><p>one two.</p><p>three</p>" +
      "<br><div>&amp; &lt;tag&gt;&nbsp;&quot;q&quot; &#39;a&#39;</div></body></html>") ==
      "T Head\none two.\nthree\n& <tag> \"q\" 'a'")
    // script content with a '<' that is NOT a tag must still vanish whole
    assert(!strip("<script>var a = 1 < 2;</script>rest").contains("var"))
    // double-encoded entities un-escape exactly one level
    assert(strip("&amp;lt;") == "&lt;")
    // whitespace runs collapse; leading/trailing trim
    assert(strip("  a   b \n\n\n c  ") == "a b\nc")
    // tag-free text passes through (entity decode aside)
    assert(strip("plain text.") == "plain text.")
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  // a caller parameterized ONLY by the contract — swapping scorers must
  // not touch this function
  private def langMix(docs: DataFrame, lid: TextScoring.LangId,
      tc: TextScoring.TokenCounter): DataFrame =
    docs.select(lid(col("text")).as("l"), tc(col("text")).as("n_tokens"))
      .groupBy(col("l.lang").as("lang"))
      .agg(sum("n_tokens").as("tokens"))

  test("default impls agree with the TextAnalysis stand-ins") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lid = new TextScoring.MarkerLangId(markers)
    val diff = docs.select(
        TextAnalysis.langId(col("text"), markers).as("want"),
        lid(col("text")).getField("lang").as("got"),
        TextAnalysis.tokenCountBpeish(col("text")).as("wantN"),
        TextScoring.BpeishTokenCounter(col("text")).as("gotN"))
      .filter(col("want") =!= col("got") || col("wantN") =!= col("gotN"))
    assert(diff.count() == 0)
  }

  test("a model-backed function plugs into an unchanged caller") {
    import spark.implicits._
    val docs = Seq(
      "bonjour le monde", "hello there world", "hallo und danke")
      .toDF("text")
    // stand-in for an ONNX/JNI classifier: any String => (lang, score)
    val model = new TextScoring.FunctionLangId(s =>
      if (s.contains("bonjour")) ("fr", 0.99)
      else if (s.contains("hallo")) ("de", 0.97)
      else ("en", 0.8))
    val counter = new TextScoring.FunctionTokenCounter(_.split("\\s+").length)
    val got = langMix(docs, model, counter)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("de", 3L), ("en", 3L), ("fr", 3L)))
    // and the same caller with the default contract impls still runs
    val dflt = langMix(docs, new TextScoring.MarkerLangId(markers),
      TextScoring.BpeishTokenCounter).collect()
    assert(dflt.nonEmpty)
  }

  test("markerModelFunction through FunctionLangId reproduces the codegen'd column") {
    // the q37-vs-q84 contract: swapping the Catalyst marker columns for
    // the UDF-wrapped JVM scorer must not change one prediction on the
    // real fixture (both also bind to the same DuckDB oracle)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val udfScorer = new TextScoring.FunctionLangId(
      TextScoring.markerModelFunction(markers))
    val diff = docs.select(
        TextAnalysis.langId(col("text"), markers).as("want"),
        udfScorer(col("text")).getField("lang").as("got"))
      .filter(col("want") =!= col("got"))
    assert(diff.count() == 0)
  }
}
