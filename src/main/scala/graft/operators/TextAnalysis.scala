package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, tokenization, shingling, quality metrics, language ID,
  * and document fingerprinting. All pure Catalyst column compositions —
  * codegen'd, no UDFs — so they survive whole-stage codegen on a 100 TB
  * scan.
  */
object TextAnalysis {

  /** Lowercase, strip non-alphanumerics, collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Whitespace word tokens of a normalized text. */
  def words(norm: Column): Column = split(norm, " ")

  /** URL canonicalization — the dedup key for web corpora (the same page
    * arrives as `HTTP://Example.COM:80/a?utm_source=x&b=1#frag` and
    * `http://example.com/a?b=1`): lowercase the scheme://host prefix
    * ONLY (paths are case-sensitive), drop the fragment, strip the
    * scheme's default port, drop tracking params (utm_*, gclid, fbclid),
    * sort the surviving query params, and normalize the empty path to
    * `/`. Every step is a regexp/array primitive both engines evaluate
    * identically, so canonical-URL dedup is oracle-replayable.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefixPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"
    val prefix = lower(regexp_extract(noFrag, s"($prefixPat)", 1))
    val rest = regexp_replace(noFrag, prefixPat, "")
    val host = regexp_replace(
      regexp_replace(prefix, "^(http://[^/?:]*):80$", "$1"),
      "^(https://[^/?:]*):443$", "$1")
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(q, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)"))
    val qs = array_join(sort_array(params), "&")
    concat(host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** HTML → text (the Common-Crawl extraction step a pretraining
    * pipeline runs before any quality scoring): drop script/style blocks
    * and comments WITH their content, turn block-level closers and <br>
    * into newlines, strip remaining tags, decode the core entities
    * (&amp; LAST, so double-encoded text un-escapes one level per pass —
    * the standard behavior), then collapse whitespace. Every step is a
    * codegen'd regexp/replace an external engine replays verbatim —
    * no DOM, no library: deterministic extraction beats faithful
    * rendering for corpus work, where the SAME bytes must always yield
    * the SAME text.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    val amp = replace(ent, lit("&amp;"), lit("&"))
    val sp = regexp_replace(amp, "[ \\t]+", " ")
    val nl = regexp_replace(sp, " ?\\n[ \\n]*", "\n")
    trim(nl, " \n")
  }

  /** Outbound links of an HTML blob: the href value of every <a> tag
    * that HAS one (an <a name=…> anchor is not a link). Case handled by
    * explicit char classes instead of regex flags so the same pattern
    * text runs verbatim on both engines. The tag name and attribute are
    * anchored — whitespace required after `<a` (so `<area>`/`<abbr>`
    * don't fire) and immediately before `href` (so `data-href` doesn't).
    * A per-row codegen'd projection, zero shuffle — the extraction stage
    * of web-graph construction; pair with [[canonicalizeUrl]] before any
    * grouping. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("<[aA][\\s](?:[^>]*[\\s])?[hH][rR][eE][fF]=\"([^\"]*)\""), lit(1))

  /** (src, html) -> (src, href, anchor_text), one row per href-bearing
    * `<a>` tag: the anchor-TEXT signal [[extractLinks]] discards — what
    * the web calls a page is a quality/relevance feature the page's own
    * text can't supply. Same tag/attribute anchoring as
    * [[extractLinks]]; the visible text is inner-tag-stripped and
    * trimmed. Per-row codegen'd extraction + one explode, no shuffle —
    * aggregation by target happens downstream. */
  def anchorPairs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("src"),
      explode(regexp_extract_all(col("html"),
        lit("(?s)(<[aA][\\s](?:[^>]*[\\s])?[hH][rR][eE][fF]=\"[^\"]*\"[^>]*>.*?</[aA]>)"),
        lit(1))).as("a_block"))
      .select(col("src"),
        regexp_extract(col("a_block"),
          "[hH][rR][eE][fF]=\"([^\"]*)\"", 1).as("href"),
        trim(regexp_replace(
          regexp_extract(col("a_block"), "(?s)^<[^>]*>(.*)</[aA]>$", 1),
          "<[^>]*>", "")).as("anchor_text"))

  /** Lower-cased host of an absolute http(s) URL ('' when not one). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[hH][tT][tT][pP][sS]?://([^/?#]+)", 1))

  /** Whitespace token count (empty string → 0). */
  def tokenCountWhitespace(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: alpha runs, single digits, and single
    * non-alphanumeric marks each count as one token — a cheap, deterministic
    * stand-in for a real subword tokenizer's token budget.
    */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles (n >= 1) over a words array; fewer than n words →
    * empty array.
    *
    * Two Spark traps handled here:
    *  - `sequence(1, 0)` yields a DESCENDING sequence, so the size guard is
    *    mandatory;
    *  - a lambda that references an OUTER column expression re-evaluates it
    *    on every element access (HOF lambdas are interpreted, no CSE) — at
    *    3 accesses × k shingles that re-ran the normalize regexes hundreds
    *    of times per row (35s for 5k docs). `transform(array(x), w => …)`
    *    binds the array once as a lambda variable.
    */
  def shingles(wordsArr: Column, n: Int): Column =
    try_element_at(
      transform(array(wordsArr), w =>
        when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
          .otherwise(array().cast(ArrayType(StringType)))),
      lit(1))

  /** Quality metrics: word count, mean word length, stopword ratio,
    * non-alphanumeric (punctuation) ratio. Ratios are exact-integer
    * divisions surfaced as rounded doubles — deterministic across engines.
    */
  def qualityMetrics(text: Column, stopwords: Seq[String]): Column = {
    // nested let-bindings (see shingles): normalize runs once, split once
    val nPunct = length(text) - length(regexp_replace(text, "[^a-z0-9\\sA-Z]", ""))
    val punctRatio =
      round(when(length(text) > 0, nPunct.cast("double") / length(text)).otherwise(0.0), 6)
    val inner = try_element_at(
      transform(array(normalize(text)), norm =>
        try_element_at(
          transform(array(words(norm)), w => {
            val nWords = when(length(norm) === 0, 0).otherwise(size(w))
            val charsInWords = length(regexp_replace(norm, " ", ""))
            val nStop = size(filter(w, x => x.isInCollection(stopwords)))
            struct(
              nWords.as("n_words"),
              round(when(nWords > 0, charsInWords.cast("double") / nWords).otherwise(0.0), 6)
                .as("avg_word_len"),
              round(when(nWords > 0, nStop.cast("double") / nWords).otherwise(0.0), 6)
                .as("stopword_ratio"))
          }),
          lit(1))),
      lit(1))
    struct(
      inner.getField("n_words").as("n_words"),
      inner.getField("avg_word_len").as("avg_word_len"),
      inner.getField("stopword_ratio").as("stopword_ratio"),
      punctRatio.as("punct_ratio"))
  }

  /** Marker-word language ID: score each candidate language by counting its
    * marker words; highest score wins, ties broken by language code order
    * (lexicographically LAST code), zero hits → "und". A real n-gram LM is
    * out of scope (no model files in a zero-egress build); the operator
    * shape — per-language score then argmax — is the production one, and
    * [[TextScoring.FunctionLangId]] is the model adapter.
    *
    * Limitation (by construction): [[normalize]] strips every non-ASCII
    * character before matching, so markers containing accented or
    * non-Latin characters can never match — usable marker sets are
    * ASCII-only, which biases toward ASCII-written languages. A model
    * scorer through the TextScoring contract is the fix, not a bigger
    * marker table.
    *
    * One implementation: this delegates to [[TextScoring.MarkerLangId]]
    * (which also exposes the score).
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    new TextScoring.MarkerLangId(markers)(text).getField("lang")

  /** Bag-of-words document fingerprint: md5 over the sorted distinct word
    * set — stable under word order permutations and duplication, the cheap
    * canonical-form fingerprint for clustering/dedup keying.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(normalize(text))))))

  /** 16-bit SimHash over word tokens. Each token hashes to 16 bits (first 4
    * hex chars of its md5); each bit position accumulates +1/-1 per token;
    * the signature bit is 1 where the sum is positive. Deterministic and
    * reproducible in any engine with md5 — no engine-private hash.
    *
    * Single pass: ONE `aggregate` with a 16-slot array accumulator (16
    * separate aggregates would re-hash every token 16×).
    */
  def simhash16(text: Column): Column = {
    val powers = array((0 until 16).map(b => lit(1 << b)): _*)
    val hashes = transform(words(normalize(text)),
      t => conv(substring(md5(t), 1, 4), 16, 10).cast(IntegerType))
    val bitSums = aggregate(
      hashes,
      transform(powers, _ => lit(0)),
      (acc, h) => zip_with(acc, powers,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, powers, (s, p) => when(s > 0, p).otherwise(lit(0))),
      lit(0), (a, x) => a + x)
  }

  /** Hamming distance between two small int signatures (e.g. simhash16). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 60-bit SimHash — the near-dup-grade signature (16 bits collide at
    * Hamming <= 3 for ~1% of RANDOM pairs, drowning real near-dups at
    * corpus scale; 60 bits make chance collisions negligible). 60, not
    * 64: the per-token hash is the first 15 md5 hex chars, which always
    * fits positive in a signed 64-bit integer, so DuckDB's BIGINT
    * replays it without unsigned-overflow games. Same sign-accumulation
    * construction as [[simhash16]].
    */
  def simhash60(text: Column): Column = {
    val powers = array((0 until 60).map(b => lit(1L << b)): _*)
    val hashes = transform(words(normalize(text)),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType))
    val bitSums = aggregate(
      hashes,
      transform(powers, _ => lit(0)),
      (acc, h) => zip_with(acc, powers,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** PII/URL scrubbing — the redaction pass a pretraining pipeline runs
    * before anything else. Regex-only (codegen'd, engine-portable):
    * emails → <EMAIL>, http(s) URLs → <URL>, long digit runs (phone/id
    * numbers) → <NUM>. Order matters: URLs before digit runs so ports and
    * path numbers don't get double-redacted.
    */
  def scrubPii(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://[^\\s]+", "<URL>")
    val noEmail = regexp_replace(noUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "[0-9]{7,}", "<NUM>")
  }

  /** Top n-gram concentration (the Gopher repetition rule family): each
    * doc's most frequent gram (ties: lexicographically first) and the
    * fraction of the doc's gram instances it accounts for — high values
    * flag template/boilerplate text that per-line dedup misses. Keyed
    * aggregations + a per-doc top-1 window over DISTINCT grams (bounded
    * by doc length); no all-pairs.
    */
  def topNgramFraction(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      gramsCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inst = docs.select(col(idCol).as("id"), explode(gramsCol).as("gram"))
    val counts = inst.groupBy("id", "gram").agg(count(lit(1)).as("n"))
    val totals = inst.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val w = Window.partitionBy("id").orderBy(col("n").desc, col("gram"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(totals, Seq("id"))
      .select(col("id"), col("gram").as("top_gram"), col("n").as("n_top"),
        col("n_grams"),
        round(col("n") / col("n_grams"), 6).as("top_frac"))
  }

  /** Compression-ratio quality signal (the Gopher/RefinedWeb repetition
    * proxy): deflated size / raw UTF-8 size. Highly repetitive text
    * compresses far below natural prose; near-random text approaches 1.
    * Runs as a scalar UDF over JDK zlib (level 6, raw deflate) — the
    * same deliberate external-codec tier as TextScoring's model
    * adapters. No SQL engine replays zlib, so the catalog entry is a
    * rows-only check and the spec pins behavior on constructed fixtures
    * (the signal's USE is thresholding, which is robust to zlib-version
    * byte-count drift). Null/empty text → null.
    */
  val compressionRatio: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) =>
      if (s == null || s.isEmpty) None
      else {
        val raw = s.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6, true)
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        Some(n.toDouble / raw.length)
      })

  /** Per-document top-k keywords by TF-IDF (tf · ln(N/df)): the standard
    * distinctive-term extraction for corpus exploration, topic tagging,
    * and mixture diagnostics. Rank on the UNROUNDED score (desc, then
    * term asc) so ordering is engine-replayable; the emitted score is
    * rounded.
    *
    * Scale shape: term frequencies and document frequencies are both
    * map-side-combinable aggregations keyed by (doc, term) / (term); the
    * doc total N is a 1-row broadcast; the final top-k windows over each
    * doc's DISTINCT terms (bounded by doc length, not corpus size). A
    * stopword-class term's df row is one row — the skew lives in the
    * (doc, term) grain, which partial aggregation flattens.
    */
  def tfidfKeywords(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      wordsCol: Column,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col(idCol).as("id"), explode(wordsCol).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"),
        round(col("score"), 6).as("score"), col("rank"))
  }
}
