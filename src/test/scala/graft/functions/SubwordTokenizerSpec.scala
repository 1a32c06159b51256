package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.{Curation, TextAnalysis}

/** The greedy longest-match subword tokenizer against an INDEPENDENT
  * reference implementation (a naive per-position max-scan over the raw
  * piece list, no first-char index, no startsWith fast path), plus the
  * packing-parity gate the round-7 verdict asked for: q66's pack
  * operator driven by expression-computed subword budgets must equal
  * the same pack driven by reference-computed budgets.
  */
class SubwordTokenizerSpec extends SparkSuite {

  /** Naive reference: at each position try EVERY piece, keep the longest
    * prefix match, fall back to one char; spaces emit nothing. */
  private def reference(s: String, pieces: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < s.length) {
      if (s.charAt(pos) == ' ') pos += 1
      else {
        val best = pieces.filter(p => s.regionMatches(pos, p, 0, p.length))
          .sortBy(p => (-p.length, p)).headOption
        best match {
          case Some(p) => out += p; pos += p.length
          case None => out += s.substring(pos, pos + 1); pos += 1
        }
      }
    }
    out.result()
  }

  private val vocab = SubwordVocab.default

  test("greedy segmentation basics") {
    assert(vocab.tokenize("").isEmpty)
    assert(vocab.tokenize("   ").isEmpty)
    // longest match wins over shorter prefixes: "ation" not "at"+"ion"
    assert(vocab.tokenize("nation").toSeq == Seq("n", "ation"))
    // fallback single chars for out-of-vocab sequences
    assert(vocab.tokenize("xyz").toSeq == Seq("x", "y", "z"))
    // spaces delimit and emit nothing
    assert(vocab.tokenize("the fact").toSeq == Seq("the", "fact"))
    // tokens re-concatenate to the input (spaces removed) — no loss
    val s = "working through the 1990s"
    assert(vocab.tokenize(s).mkString == s.replace(" ", ""))
  }

  test("expression output equals the naive reference on fuzzed inputs") {
    val rnd = new scala.util.Random(31)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    val inputs = (1 to 300).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    } ++ Seq("", " ", "the", "theth", "ingestion", "overunderout")
    inputs.foreach { s =>
      assert(vocab.tokenize(s).toSeq == reference(s, vocab.pieces),
        s"diverged on '$s'")
    }
  }

  test("DataFrame path (codegen) equals driver-side eval") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val docs = (1 to 200).map { i =>
      val n = rnd.nextInt(60)
      val alpha = "abcdefgh the ing ation 019 "
      (i.toLong, (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"),
        SubwordTokenizer.tokens(TextAnalysis.normalize(col("text"))).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.collect().foreach { r =>
      val norm = r.getString(1).toLowerCase
        .replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
      assert(got(r.getLong(0)) == reference(norm, vocab.pieces).toSeq,
        s"row ${r.getLong(0)}")
    }
  }

  test("packing parity: expression-budget pack == reference-budget pack") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val words = Seq("the", "nation", "work", "xyzq", "overflow", "19",
      "ingestion", "under", "fact", "zzz")
    val docs = (1 to 150).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(30)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val exprPack = Curation.packSequences(df, col("doc_id"),
      size(SubwordTokenizer.tokens(TextAnalysis.normalize(col("text"))))
        .cast("long"),
      budget = 64, buckets = 4)
    val refCounts = docs.map { case (id, text) =>
      (id, reference(text, vocab.pieces).size.toLong)
    }.toDF("doc_id", "n")
    val refPack = Curation.packSequences(
      df.join(refCounts, "doc_id"), col("doc_id"), col("n"),
      budget = 64, buckets = 4)
    val a = exprPack.orderBy("id").collect().toSeq
    val b = refPack.orderBy("id").collect().toSeq
    assert(a == b)
  }
}
