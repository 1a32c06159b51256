package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables.load
import graft.operators.{Curation, TextAnalysis}

/** Corpus-curation queries: benchmark decontamination, stratified
  * sampling, and sequence packing over the documents fixture — the steps
  * between dedup and the final training shuffle. All md5-deterministic so
  * the DuckDB oracle replays them exactly.
  */
object CurationQueries {

  // DuckDB-side normalized text, matching TextAnalysis.normalize.
  private val DuckNorm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  // DuckDB-side md5 sampling bucket, matching Curation.samplingBucket.
  private def duckBucket(salt: String, buckets: Int): String =
    s"CAST(CAST(concat('0x', substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % $buckets AS INT)"

  val all: Seq[OpQuery] = Seq(

    // Benchmark decontamination: train-split docs sharing any distinct
    // 5-gram with the test split get flagged. The eval shingle set
    // broadcasts (benchmarks are small by construction), so at 100 TB the
    // corpus side is one map-side semi-join — corpus rows with no eval hit
    // never shuffle.
    OpQuery.sql(
      "q64_decontaminate",
      s"""WITH d AS (SELECT doc_id, ${duckBucket("", 100)} AS b, $DuckNorm AS norm FROM documents),
         |t AS (SELECT doc_id, b, string_split(norm, ' ') w FROM d),
         |i AS (SELECT doc_id, b, w, unnest(generate_series(1, len(w)-4)) AS i FROM t),
         |sh AS (SELECT DISTINCT doc_id, b,
         |         w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS s FROM i),
         |ev AS (SELECT DISTINCT s FROM sh WHERE b >= 90),
         |ov AS (SELECT sh.doc_id, count(*) n FROM sh JOIN ev USING (s)
         |       WHERE sh.b < 80 GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
         |       coalesce(ov.n, 0) >= 1 AS contaminated
         |FROM d LEFT JOIN ov ON d.doc_id = ov.doc_id
         |WHERE d.b < 80""".stripMargin) {
      (s, dir) =>
        val withSplit = load(s, dir, "documents").select(
          col("doc_id").as("id"), col("text"),
          Curation.samplingBucket(col("doc_id"), 100).as("b"))
        def shingles(d: DataFrame): DataFrame = d.select(
          col("id"),
          explode(TextAnalysis.shingles(
            TextAnalysis.words(TextAnalysis.normalize(col("text"))), 5)).as("shingle"))
          .distinct()
        val train = withSplit.filter(col("b") < 80)
        Curation.decontaminate(
            train.select("id"), shingles(train),
            shingles(withSplit.filter(col("b") >= 90)))
          .select(col("id").as("doc_id"), col("n_overlap"), col("contaminated"))
    },

    // Bloom-filter decontamination — q64's memory-bounded scale twin: the
    // eval suite broadcasts as <= 4096 bloom slots (3 md5 hashes per
    // shingle) instead of the shingle strings, the corpus probes it with
    // 3 chained broadcast semi-joins (still no corpus shuffle on the eval
    // side), and false positives land deterministically — the oracle
    // rebuilds the IDENTICAL filter, so even the over-removals must
    // match bit-for-bit.
    OpQuery.sql(
      "q86_decontaminate_bloom",
      s"""WITH d AS (SELECT doc_id, ${duckBucket("", 100)} AS b, $DuckNorm AS norm FROM documents),
         |t AS (SELECT doc_id, b, string_split(norm, ' ') w FROM d),
         |i AS (SELECT doc_id, b, w, unnest(generate_series(1, len(w)-4)) AS i FROM t),
         |sh AS (SELECT DISTINCT doc_id, b,
         |         w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS s FROM i),
         |kg AS (SELECT unnest(generate_series(0, 2)) AS hk),
         |bits AS (SELECT DISTINCT
         |    CAST(CAST(concat('0x', substr(md5('bf' || CAST(hk AS VARCHAR) || '|' || s), 1, 8)) AS BIGINT) % 4096 AS BIGINT) AS slot
         |  FROM sh, kg WHERE b >= 90),
         |probe AS (SELECT sh.doc_id, sh.s, kg.hk,
         |    CAST(CAST(concat('0x', substr(md5('bf' || CAST(kg.hk AS VARCHAR) || '|' || sh.s), 1, 8)) AS BIGINT) % 4096 AS BIGINT) AS slot
         |  FROM sh, kg WHERE sh.b < 80),
         |hits AS (SELECT doc_id, s FROM (
         |    SELECT p.doc_id, p.s, count(*) AS nhit
         |    FROM probe p JOIN bits USING (slot) GROUP BY p.doc_id, p.s) t
         |  WHERE nhit = 3),
         |ov AS (SELECT doc_id, count(*) AS n FROM hits GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
         |       coalesce(ov.n, 0) >= 1 AS contaminated
         |FROM d LEFT JOIN ov ON d.doc_id = ov.doc_id
         |WHERE d.b < 80""".stripMargin) {
      (s, dir) =>
        val withSplit = load(s, dir, "documents").select(
          col("doc_id").as("id"), col("text"),
          Curation.samplingBucket(col("doc_id"), 100).as("b"))
        def shingles(d: DataFrame): DataFrame = d.select(
          col("id"),
          explode(TextAnalysis.shingles(
            TextAnalysis.words(TextAnalysis.normalize(col("text"))), 5)).as("shingle"))
          .distinct()
        val train = withSplit.filter(col("b") < 80)
        Curation.decontaminateBloom(
            train.select("id"), shingles(train),
            shingles(withSplit.filter(col("b") >= 90)),
            mBits = 4096, kHashes = 3)
          .select(col("id").as("doc_id"), col("n_overlap"), col("contaminated"))
    },

    // Stratified sampling: per-language keep-rates rebalance the corpus
    // mixture (down-sample dominant en, keep the tail whole). Pure per-row
    // md5 predicate — zero shuffle, exactly re-derivable.
    OpQuery.sql(
      "q65_stratified_sample",
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, ${duckBucket("mix1", 1000000)} AS bkt FROM documents)
         |WHERE bkt < CAST(1000000 * CASE lang
         |  WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.8 WHEN 'es' THEN 0.25
         |  ELSE 1.0 END AS INT)""".stripMargin) {
      (s, dir) =>
        Curation.stratifiedSample(
            load(s, dir, "documents"),
            col("lang"), col("doc_id"),
            Map("en" -> 0.5, "zh" -> 0.8, "es" -> 0.25),
            defaultRate = 1.0, salt = "mix1")
          .select("doc_id", "lang")
    },

    // Deterministic fixed-size per-group sample: exactly 25 docs per
    // source (fewer if a source is smaller), membership pinned by a
    // seeded md5 ranking — the "stable eval slice per source" primitive
    // rate-based sampling can't provide. The rank<=k filter plans as
    // WindowGroupLimit (bounded per-group heap, no full group sort).
    OpQuery.sql(
      "q78_fixed_size_sample",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY md5('fss' || CAST(doc_id AS VARCHAR)), doc_id) AS r
        |  FROM documents)
        |WHERE r <= 25""".stripMargin) {
      (s, dir) =>
        Curation.fixedSizeSample(
            load(s, dir, "documents"),
            col("source"), col("doc_id"), k = 25)
          .select("doc_id", "source")
    },

    // Weighted sample without replacement (Efraimidis-Spirakis): 10 of
    // each source's 25 docs, inclusion probability proportional to
    // n_chars; the md5-uniform draw and the ln(u)/w key replay in SQL,
    // so MEMBERSHIP is engine-checked — a wrong key anywhere picks a
    // different 10.
    OpQuery.sql(
      "q107_weighted_sample",
      """WITH t AS (SELECT doc_id, source, n_chars,
        |    (CAST(concat('0x', substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      + 0.5) / 4294967296.0 AS u
        |  FROM documents),
        |r AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY ln(u) / n_chars DESC, doc_id) AS rnk
        |  FROM t)
        |SELECT doc_id, source, n_chars FROM r WHERE rnk <= 10""".stripMargin) {
      (s, dir) =>
        Curation.weightedSample(
            load(s, dir, "documents"),
            col("source"), col("doc_id"), col("n_chars").cast("double"), k = 10)
          .select("doc_id", "source", "n_chars")
    },

    // Document chunking: 200-char windows with 40-char overlap, plus
    // offsets — per-row explode, shuffle-free.
    OpQuery.sql(
      "q71_chunking",
      """SELECT doc_id, CAST(i AS INT) AS chunk_start,
        |  CAST((i - 1) // 160 AS INT) AS chunk_idx,
        |  substr(text, i, 200) AS chunk_text,
        |  CAST(length(substr(text, i, 200)) AS INT) AS chunk_len
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(1, greatest(length(text) - 40, 1), 160)) AS i
        |      FROM documents WHERE length(text) > 0)""".stripMargin) {
      (s, dir) =>
        Curation.chunk(load(s, dir, "documents"), col("text"), chunkChars = 200, overlap = 40)
          .select("doc_id", "chunk_start", "chunk_idx", "chunk_text", "chunk_len")
    },

    // Mixture-rate computation: target corpus shares per source → the
    // per-source repetition weight (share × total_tokens / source_tokens).
    // One small groupBy + a broadcast of the grand total.
    OpQuery.sql(
      "q67_mixture_rates",
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |    sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE len(string_split_regex(trim(text), '\s+')) END AS DECIMAL(27,0)))
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT sum(n_tokens) AS total FROM s)
        |SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(coalesce(
        |    CASE source WHEN 'src0' THEN 0.2 WHEN 'src1' THEN 0.05 END
        |      * CAST(total AS DOUBLE) / CAST(n_tokens AS DOUBLE), 1.0), 6) AS rate
        |FROM s CROSS JOIN t""".stripMargin) {
      (s, dir) =>
        Curation.mixtureRates(
          load(s, dir, "documents"),
          col("source"),
          TextAnalysis.tokenCountWhitespace(col("text")),
          Map("src0" -> 0.2, "src1" -> 0.05))
    },

    // Deterministic fractional repetition: per-language weights applied as
    // floor(w) copies + one md5-decided extra — down- and up-sampling in
    // one per-row pass (en halved, zh ~2.5x, rest kept).
    OpQuery.sql(
      "q68_upsample",
      s"""WITH d AS (SELECT doc_id, lang,
         |    CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 2.5 ELSE 1.0 END AS w,
         |    ${duckBucket("up", 1000000)} AS bkt
         |  FROM documents),
         |c AS (SELECT doc_id, lang,
         |    CAST(floor(w) + CASE WHEN bkt < CAST(floor((w - floor(w)) * 1000000) AS INT)
         |      THEN 1 ELSE 0 END AS INT) AS copies
         |  FROM d)
         |SELECT doc_id, lang, CAST(unnest(generate_series(1, copies)) AS INT) AS copy_idx
         |FROM c WHERE copies >= 1""".stripMargin) {
      (s, dir) =>
        val w = when(col("lang") === "en", 0.5)
          .when(col("lang") === "zh", 2.5).otherwise(1.0)
        Curation.upsample(
          load(s, dir, "documents").select(col("doc_id"), col("lang")),
          col("doc_id"), w)
    },

    // The capstone: the full corpus-assembly pipeline composed end-to-end —
    // quality filter → exact dedup (keep min id per content hash) → train
    // split → benchmark decontamination (vs the test split) → stratified
    // per-language sampling → sequence packing. Every stage is
    // deterministic, so the DuckDB oracle replays the entire pipeline and
    // the final packed layout must match bit-for-bit.
    OpQuery.sql(
      "q72_curation_pipeline",
      s"""WITH d AS (SELECT doc_id, lang, text, $DuckNorm AS norm,
         |    ${duckBucket("", 100)} AS b FROM documents),
         |w AS (SELECT *, string_split(norm, ' ') AS ws FROM d),
         |m AS (SELECT doc_id, lang, text, norm, b, ws,
         |    CASE WHEN length(norm) = 0 THEN 0 ELSE len(ws) END AS n_words,
         |    round(CASE WHEN length(norm) = 0 OR len(ws) = 0 THEN 0.0
         |      ELSE CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(ws) END, 6) AS awl,
         |    round(CASE WHEN length(norm) = 0 OR len(ws) = 0 THEN 0.0
         |      ELSE CAST(len(list_filter(ws, x -> x IN ('the','a','and','of','to','in'))) AS DOUBLE) / len(ws) END, 6) AS swr
         |  FROM w),
         |q AS (SELECT * FROM m
         |  WHERE n_words BETWEEN 10 AND 100000 AND awl BETWEEN 2 AND 12 AND swr >= 0.01),
         |dd AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(norm)) AS keep_id FROM q),
         |train AS (SELECT * FROM dd WHERE doc_id = keep_id AND b < 80),
         |evi AS (SELECT ws, unnest(generate_series(1, len(ws)-4)) AS i FROM w WHERE b >= 90),
         |evsh AS (SELECT DISTINCT ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4] AS s FROM evi),
         |tri AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-4)) AS i FROM train),
         |trsh AS (SELECT DISTINCT doc_id,
         |    ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4] AS s FROM tri),
         |contam AS (SELECT DISTINCT trsh.doc_id FROM trsh JOIN evsh USING (s)),
         |clean AS (SELECT t.* FROM train t LEFT JOIN contam c ON t.doc_id = c.doc_id
         |          WHERE c.doc_id IS NULL),
         |samp AS (SELECT * FROM (
         |    SELECT doc_id, lang, text,
         |      ${duckBucket("mix1", 1000000)} AS bkt FROM clean)
         |  WHERE bkt < CAST(1000000 * CASE lang
         |    WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.8 WHEN 'es' THEN 0.25
         |    ELSE 1.0 END AS INT)),
         |tok AS (SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    ${duckBucket("pack", 4)} AS bucket
         |  FROM samp),
         |c AS (SELECT doc_id, bucket,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM tok)
         |SELECT doc_id, bucket, CAST(cum // 1024 AS BIGINT) AS seq_id,
         |       CAST(cum % 1024 AS BIGINT) AS seq_offset
         |FROM c""".stripMargin) {
      (s, dir) =>
        val stopwords = Seq("the", "a", "and", "of", "to", "in")
        val withB = load(s, dir, "documents").select(
          col("doc_id"), col("lang"), col("text"),
          Curation.samplingBucket(col("doc_id"), 100).as("b"))
        val q = withB
          .withColumn("q", TextAnalysis.qualityMetrics(col("text"), stopwords))
          .filter(col("q.n_words").between(10, 100000) &&
            col("q.avg_word_len").between(2, 12) && col("q.stopword_ratio") >= 0.01)
        // train feeds several consumers (its shingles, the decontaminate
        // id set, the clean anti-join) — uncached each consumer re-ran
        // the quality metrics + normalize-md5 window from the scan
        // (r16, guide §5 caching: reused and expensive to recompute)
        val train = q
          .withColumn("keep_id", min("doc_id").over(
            Window.partitionBy(md5(TextAnalysis.normalize(col("text"))))))
          .filter(col("doc_id") === col("keep_id") && col("b") < 80)
          .cache()
        def shingles(d: DataFrame): DataFrame = d.select(
          col("doc_id").as("id"),
          explode(TextAnalysis.shingles(
            TextAnalysis.words(TextAnalysis.normalize(col("text"))), 5)).as("shingle"))
          .distinct()
        val clean = train.join(
          Curation.decontaminate(train.select(col("doc_id").as("id")),
              shingles(train), shingles(withB.filter(col("b") >= 90)))
            .filter(col("contaminated")).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        val samp = Curation.stratifiedSample(clean, col("lang"), col("doc_id"),
          Map("en" -> 0.5, "zh" -> 0.8, "es" -> 0.25), defaultRate = 1.0, salt = "mix1")
        Curation.packSequences(samp, col("doc_id"),
            TextAnalysis.tokenCountWhitespace(col("text")).cast("long"),
            budget = 1024, buckets = 4)
          .select(col("id").as("doc_id"), col("bucket"), col("seq_id"), col("seq_offset"))
    },

    // Sequence packing: documents laid end-to-end into 2048-token training
    // sequences across 8 independent pack streams (shard by md5, window
    // cum-sum within shard — the one sequential dependency is per-bucket).
    OpQuery.sql(
      "q66_sequence_pack",
      s"""WITH d AS (SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    ${duckBucket("pack", 8)} AS bucket
         |  FROM documents),
         |c AS (SELECT doc_id, bucket,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM d)
         |SELECT doc_id, bucket, CAST(cum // 2048 AS BIGINT) AS seq_id,
         |       CAST(cum % 2048 AS BIGINT) AS seq_offset
         |FROM c""".stripMargin) {
      (s, dir) =>
        Curation.packSequences(
            load(s, dir, "documents"),
            col("doc_id"),
            TextAnalysis.tokenCountWhitespace(col("text")).cast("long"),
            budget = 2048, buckets = 8)
          .select(col("id").as("doc_id"), col("bucket"), col("seq_id"), col("seq_offset"))
    },

    // Packed-sequence BOUNDARY metadata (q66's pack, loader-side view):
    // per (bucket, sequence) the doc count, token sum, and the ordered
    // offset:doc:ntok boundary string — what a training loader needs to
    // build block-diagonal attention masks over packed sequences. The
    // boundary list is collected sorted-by-offset and joined to ONE
    // deterministic string, so the oracle compares the exact assembly
    // order without array-typed columns in the compare.
    OpQuery.sql(
      "q176_pack_boundaries",
      s"""WITH d AS (SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    ${duckBucket("pack", 8)} AS bucket
         |  FROM documents),
         |c AS (SELECT doc_id, bucket, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM d),
         |p AS (SELECT doc_id, bucket, n_tokens,
         |    CAST(cum // 2048 AS BIGINT) AS seq_id,
         |    CAST(cum % 2048 AS BIGINT) AS seq_offset
         |  FROM c)
         |SELECT bucket, seq_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  string_agg(CAST(seq_offset AS VARCHAR) || ':' ||
         |      CAST(doc_id AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR),
         |    ',' ORDER BY seq_offset, doc_id) AS boundaries
         |FROM p GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val toks = load(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.tokenCountWhitespace(col("text")).cast("long")
              .as("n_tokens"))
        val packed = Curation.packSequences(
            toks, col("doc_id"), col("n_tokens"), budget = 2048, buckets = 8)
          .join(toks.select(col("doc_id").as("id"), col("n_tokens")),
            Seq("id"))
        packed.groupBy("bucket", "seq_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("n_tokens"),
            array_join(
              transform(
                array_sort(collect_list(struct(
                  col("seq_offset"), col("id"), col("n_tokens")))),
                x => concat_ws(":",
                  x.getField("seq_offset"), x.getField("id"),
                  x.getField("n_tokens"))),
              ",").as("boundaries"))
    },

    // LM-perplexity quality scoring (the CCNet recipe, round 5): an
    // add-one-smoothed bigram word model TRAINED on the trusted 80%
    // split scores EVERY doc by average negative log-likelihood — the
    // filter that catches fluent-looking junk the heuristic ratios
    // (q36) cannot. Fully relational: train = two groupBy counts +
    // |vocab|; score = bigram equi-joins with smoothing-floor fallbacks
    // + one per-doc mean. Counts are exact integers and the log/mean
    // arithmetic is fixed-order f64, so the oracle replays the whole
    // model — DuckDB ln vs JVM log agree far below the rounded 1e-6.
    OpQuery.sql(
      "q97_lm_perplexity",
      s"""WITH d AS (SELECT doc_id, ${duckBucket("", 100)} AS b,
         |    string_split($DuckNorm, ' ') w FROM documents),
         |tr AS (SELECT * FROM d WHERE b < 80),
         |uni AS (SELECT w1, count(*) c1 FROM (
         |    SELECT unnest(w) w1 FROM tr) z GROUP BY 1),
         |big AS (SELECT w1, w2, count(*) c2 FROM (
         |    SELECT w[i] w1, w[i+1] w2 FROM (
         |      SELECT w, unnest(generate_series(1, len(w) - 1)) i FROM tr) z) z2
         |  GROUP BY 1, 2),
         |v AS (SELECT count(*) vc FROM uni),
         |cb AS (SELECT doc_id, w[i] w1, w[i+1] w2 FROM (
         |    SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) i FROM d) z),
         |nll AS (SELECT doc_id,
         |    -ln((coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + vc)) AS nll
         |  FROM cb LEFT JOIN big USING (w1, w2)
         |          LEFT JOIN uni USING (w1) CROSS JOIN v),
         |agg AS (SELECT doc_id, count(*) n, sum(nll) s FROM nll GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
         |       round(agg.s / agg.n, 6) AS avg_nll
         |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin) {
      (s, dir) =>
        val docs = load(s, dir, "documents")
        val train = docs
          .filter(Curation.samplingBucket(col("doc_id"), 100) < 80)
          .select(col("doc_id"), col("text"))
        val (bigrams, unigrams, vocab) =
          graft.operators.LanguageModel.trainBigram(train, col("text"))
        graft.operators.LanguageModel.scoreBigram(
            docs.select(col("doc_id"), col("text")), col("text"),
            bigrams, unigrams, vocab)
          .select(col("doc_id"), col("n_bigrams"),
            round(col("avg_nll"), 6).as("avg_nll"))
    },

    // The FULL curation recipe (round-6 ask #8 — q72 extended with the
    // two samplers it lacked): quality heuristics → exact dedup →
    // benchmark decontamination → LM-PERPLEXITY GATE (the q97 bigram
    // model trained on the trusted 80% slice; docs above 3.5 avg-NLL
    // drop) → stratified per-language sampling → QUALITY-WEIGHTED
    // reservoir (Efraimidis-Spirakis top-12 per language, weight =
    // 1/(1+avg_nll), so fluent docs win ties) → sequence packing. Every
    // stage is deterministic (md5 buckets, integer counts, rounded
    // f64 weights), so the oracle replays the entire recipe.
    OpQuery.sql(
      "q115_curation_capstone",
      s"""WITH d AS (SELECT doc_id, lang, text, $DuckNorm AS norm,
         |    ${duckBucket("", 100)} AS b FROM documents),
         |w AS (SELECT *, string_split(norm, ' ') AS ws FROM d),
         |m AS (SELECT doc_id, lang, text, norm, b, ws,
         |    CASE WHEN length(norm) = 0 THEN 0 ELSE len(ws) END AS n_words,
         |    round(CASE WHEN length(norm) = 0 OR len(ws) = 0 THEN 0.0
         |      ELSE CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(ws) END, 6) AS awl,
         |    round(CASE WHEN length(norm) = 0 OR len(ws) = 0 THEN 0.0
         |      ELSE CAST(len(list_filter(ws, x -> x IN ('the','a','and','of','to','in'))) AS DOUBLE) / len(ws) END, 6) AS swr
         |  FROM w),
         |q AS (SELECT * FROM m
         |  WHERE n_words BETWEEN 10 AND 100000 AND awl BETWEEN 2 AND 12 AND swr >= 0.01),
         |dd AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(norm)) AS keep_id FROM q),
         |train AS (SELECT * FROM dd WHERE doc_id = keep_id AND b < 80),
         |evi AS (SELECT ws, unnest(generate_series(1, len(ws)-4)) AS i FROM w WHERE b >= 90),
         |evsh AS (SELECT DISTINCT ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4] AS s FROM evi),
         |tri AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-4)) AS i FROM train),
         |trsh AS (SELECT DISTINCT doc_id,
         |    ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4] AS s FROM tri),
         |contam AS (SELECT DISTINCT trsh.doc_id FROM trsh JOIN evsh USING (s)),
         |clean AS (SELECT t.* FROM train t LEFT JOIN contam c ON t.doc_id = c.doc_id
         |          WHERE c.doc_id IS NULL),
         |lmtr AS (SELECT * FROM w WHERE b < 80),
         |uni AS (SELECT w1, count(*) c1 FROM (
         |    SELECT unnest(ws) w1 FROM lmtr) z GROUP BY 1),
         |big AS (SELECT w1, w2, count(*) c2 FROM (
         |    SELECT ws[i] w1, ws[i+1] w2 FROM (
         |      SELECT ws, unnest(generate_series(1, len(ws) - 1)) i FROM lmtr) z) z2
         |  GROUP BY 1, 2),
         |v AS (SELECT count(*) vc FROM uni),
         |cb AS (SELECT doc_id, ws[i] w1, ws[i+1] w2 FROM (
         |    SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) i FROM clean) z),
         |nll AS (SELECT doc_id,
         |    -ln((coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + vc)) AS nll
         |  FROM cb LEFT JOIN big USING (w1, w2)
         |          LEFT JOIN uni USING (w1) CROSS JOIN v),
         |ppl AS (SELECT doc_id, round(sum(nll) / count(*), 6) AS avg_nll
         |  FROM nll GROUP BY 1),
         |fluent AS (SELECT c.*, p.avg_nll FROM clean c JOIN ppl p USING (doc_id)
         |  WHERE p.avg_nll <= 3.5),
         |samp AS (SELECT * FROM (
         |    SELECT doc_id, lang, text, avg_nll,
         |      ${duckBucket("mix1", 1000000)} AS bkt FROM fluent)
         |  WHERE bkt < CAST(1000000 * CASE lang
         |    WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.8 WHEN 'es' THEN 0.25
         |    ELSE 1.0 END AS INT)),
         |ws2 AS (SELECT doc_id, lang, text, avg_nll,
         |    (CAST(concat('0x', substr(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      + 0.5) / 4294967296.0 AS u
         |  FROM samp),
         |picked AS (SELECT doc_id, lang, text, avg_nll FROM (
         |    SELECT *, row_number() OVER (PARTITION BY lang
         |        ORDER BY ln(u) / (1.0 / (1.0 + avg_nll)) DESC, doc_id) AS rnk
         |    FROM ws2) z WHERE rnk <= 12),
         |tok AS (SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    ${duckBucket("pack", 2)} AS bucket
         |  FROM picked),
         |c AS (SELECT doc_id, bucket,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM tok)
         |SELECT doc_id, bucket, CAST(cum // 1024 AS BIGINT) AS seq_id,
         |       CAST(cum % 1024 AS BIGINT) AS seq_offset
         |FROM c""".stripMargin) {
      (s, dir) =>
        val stopwords = Seq("the", "a", "and", "of", "to", "in")
        val docs = load(s, dir, "documents")
        val withB = docs.select(
          col("doc_id"), col("lang"), col("text"),
          Curation.samplingBucket(col("doc_id"), 100).as("b"))
        val q = withB
          .withColumn("q", TextAnalysis.qualityMetrics(col("text"), stopwords))
          .filter(col("q.n_words").between(10, 100000) &&
            col("q.avg_word_len").between(2, 12) && col("q.stopword_ratio") >= 0.01)
        // train feeds several consumers (its shingles, the decontaminate
        // id set, the clean anti-join) — uncached each consumer re-ran
        // the quality metrics + normalize-md5 window from the scan
        // (r16, guide §5 caching: reused and expensive to recompute)
        val train = q
          .withColumn("keep_id", min("doc_id").over(
            Window.partitionBy(md5(TextAnalysis.normalize(col("text"))))))
          .filter(col("doc_id") === col("keep_id") && col("b") < 80)
          .cache()
        def shingles(d: DataFrame): DataFrame = d.select(
          col("doc_id").as("id"),
          explode(TextAnalysis.shingles(
            TextAnalysis.words(TextAnalysis.normalize(col("text"))), 5)).as("shingle"))
          .distinct()
        val clean = train.join(
          Curation.decontaminate(train.select(col("doc_id").as("id")),
              shingles(train), shingles(withB.filter(col("b") >= 90)))
            .filter(col("contaminated")).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
          // two consumers (the LM scoring input and the fluent join):
          // uncached, the decontaminate shingle join re-ran per consumer
          .cache()
        // LM gate: the q97 model (trained on the RAW trusted slice, not
        // the curated one — scoring must not depend on what it scores)
        val (bigrams, unigrams, vocab) = graft.operators.LanguageModel
          .trainBigram(docs.filter(
              Curation.samplingBucket(col("doc_id"), 100) < 80)
            .select(col("doc_id"), col("text")), col("text"))
        val scored = graft.operators.LanguageModel.scoreBigram(
            clean.select(col("doc_id"), col("text")), col("text"),
            bigrams, unigrams, vocab)
          .select(col("doc_id"), round(col("avg_nll"), 6).as("avg_nll"))
        val fluent = clean.join(scored, Seq("doc_id"))
          .filter(col("avg_nll") <= 3.5)
        val samp = Curation.stratifiedSample(fluent, col("lang"), col("doc_id"),
          Map("en" -> 0.5, "zh" -> 0.8, "es" -> 0.25), defaultRate = 1.0,
          salt = "mix1")
        val picked = Curation.weightedSample(samp, col("lang"), col("doc_id"),
          lit(1.0) / (lit(1.0) + col("avg_nll")), k = 12, salt = "cap")
        Curation.packSequences(picked, col("doc_id"),
            TextAnalysis.tokenCountWhitespace(col("text")).cast("long"),
            budget = 1024, buckets = 2)
          .select(col("id").as("doc_id"), col("bucket"), col("seq_id"),
            col("seq_offset"))
    },

    // DOMAIN-level quality curation (curate by SOURCE, not only by
    // document — the RefinedWeb/DCLM move): id-derived URLs carry six
    // synthetic registered domains; each doc's 6-decimal stopword
    // ratio aggregates to its domain through an exact DECIMAL sum, and
    // every doc of a domain whose mean falls below 0.061 is dropped.
    // The oracle replays URL parse -> domain -> exact mean -> keep bit;
    // the drop list is broadcast, so the per-doc pass never shuffles.
    OpQuery.sql(
      "q135_domain_quality_filter",
      s"""WITH t AS (SELECT doc_id,
         |    'https://w' || CAST(doc_id % 3 AS VARCHAR) || '.domain' ||
         |      CAST(doc_id % 6 AS VARCHAR) || '.com/p/' || CAST(doc_id AS VARCHAR) AS url,
         |    $DuckNorm AS n FROM documents),
         |h AS (SELECT doc_id,
         |    regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
         |      '([^.]+\\.[^.]+)$$', 1) AS domain, n FROM t),
         |w AS (SELECT doc_id, domain, string_split(n, ' ') ws FROM h),
         |m AS (SELECT doc_id, domain,
         |  round(CASE WHEN length(ws[1]) = 0 OR len(ws) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(ws, x -> x IN ('the','a','and','of','to','in'))) AS DOUBLE) / len(ws) END, 6) AS swr
         |  FROM w),
         |s AS (SELECT domain,
         |    CAST(sum(CAST(swr AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean
         |  FROM m GROUP BY 1)
         |SELECT m.doc_id, m.domain,
         |  CAST(CASE WHEN s.mean < 0.061 THEN 0 ELSE 1 END AS INTEGER) AS keep
         |FROM m JOIN s USING (domain)""".stripMargin) {
      (s, dir) =>
        val docs = load(s, dir, "documents")
        val url = concat(lit("https://w"), (col("doc_id") % 3).cast("string"),
          lit(".domain"), (col("doc_id") % 6).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string"))
        val host = regexp_extract(url, "^[a-z]+://([^/]+)", 1)
        val domain = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
        Curation.domainQualityFilter(
          docs.select(col("doc_id"), domain.as("domain"),
            TextAnalysis.qualityMetrics(col("text"),
              Seq("the", "a", "and", "of", "to", "in"))
              .getField("stopword_ratio").as("swr")),
          col("doc_id"), col("domain"), col("swr"), minMean = 0.061)
          .select(col("id").as("doc_id"), col("domain"), col("keep"))
    },

    // LENGTH-GROUPED batching (the group_by_length trick): fixed-size
    // batches padded to their longest member waste max−len tokens per
    // doc; ordering by length before batching makes batches
    // homogeneous and collapses the waste. Both orderings are computed
    // and their per-batch padding waste compared — the measurable
    // claim, not just the shuffle. The ordering window is the batching
    // SEMANTIC (production shards it by the same sampling buckets the
    // packer uses); 8-doc batches, whitespace token counts (q38's
    // baseline — q127 is the subword-budget form).
    OpQuery.sql(
      "q157_length_grouped_batching",
      s"""WITH t AS (SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok
         |  FROM documents),
         |naive AS (SELECT doc_id, n_tok,
         |    CAST((row_number() OVER (ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch_idx
         |  FROM t),
         |grouped AS (SELECT doc_id, n_tok,
         |    CAST((row_number() OVER (ORDER BY n_tok, doc_id) - 1) // 8 AS BIGINT) AS batch_idx
         |  FROM t),
         |u AS (SELECT 'naive' AS mode, batch_idx, n_tok FROM naive
         |  UNION ALL SELECT 'grouped', batch_idx, n_tok FROM grouped)
         |SELECT mode, batch_idx,
         |  CAST(count(*) AS INTEGER) AS n_docs,
         |  CAST(max(n_tok) AS BIGINT) AS max_len,
         |  CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS padding_waste
         |FROM u GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val t = load(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.tokenCountWhitespace(col("text")).cast("long").as("n_tok"))
        def batched(mode: String, order: Seq[org.apache.spark.sql.Column]) =
          t.withColumn("batch_idx",
              ((row_number().over(Window.orderBy(order: _*)) - 1) / 8)
                .cast("long"))
            .groupBy(lit(mode).as("mode"), col("batch_idx"))
            .agg(count(lit(1)).cast("int").as("n_docs"),
              max("n_tok").as("max_len"),
              (count(lit(1)) * max("n_tok") - sum("n_tok")).as("padding_waste"))
        batched("naive", Seq(col("doc_id")))
          .unionByName(batched("grouped", Seq(col("n_tok"), col("doc_id"))))
    },

    // Domain-CAP sampling (the Gopher/RefinedWeb recipe: no single
    // domain may dominate the corpus): keep at most 20 docs per source,
    // drawn by md5 order — a uniform, re-derivable draw with no
    // temporal bias (doc_id order would systematically keep the oldest
    // pages). Every doc keeps its draw rank and verdict so the cap's
    // effect is auditable, not silent.
    OpQuery.sql(
      "q191_domain_cap_sampling",
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source, CAST(rn AS INTEGER) AS draw_rank,
        |  rn <= 20 AS kept
        |FROM r""".stripMargin) {
      (s, dir) =>
        load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("draw_rank", row_number().over(
            Window.partitionBy("source")
              .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
          .select(col("doc_id"), col("source"), col("draw_rank"),
            (col("draw_rank") <= 20).as("kept"))
    },

    // WINSORIZATION at exact per-language p05/p95 (q144's nearest-rank
    // order statistics): the outlier treatment that keeps rows — clamp,
    // don't drop — reported as per-language clamp counts plus the
    // clamped mean via exact DECIMAL sums, so nothing in the row
    // depends on float fold order.
    OpQuery.sql(
      "q192_winsorized_lengths",
      """WITH t AS (SELECT lang, n_chars AS v FROM documents),
        |r AS (SELECT lang, v,
        |    row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM t),
        |q AS (SELECT lang,
        |    max(CASE WHEN rn - 1 = floor((n - 1) * 0.05) THEN v END) AS p05,
        |    max(CASE WHEN rn - 1 = floor((n - 1) * 0.95) THEN v END) AS p95
        |  FROM r GROUP BY 1),
        |c AS (SELECT t.lang, v, p05, p95,
        |    CASE WHEN v < p05 THEN p05 WHEN v > p95 THEN p95 ELSE v END AS w
        |  FROM t JOIN q USING (lang))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN v < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN v > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  p05, p95,
        |  round(CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE) / count(*), 6)
        |    AS winsorized_mean
        |FROM c GROUP BY 1, p05, p95""".stripMargin) {
      (s, dir) =>
        val t = load(s, dir, "documents")
          .select(col("lang"), col("n_chars").as("v"))
        val ranked = t
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang").orderBy("v")))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
        val q = ranked.groupBy("lang").agg(
          max(when(col("rn") - 1 === floor((col("n") - 1) * lit(0.05)),
            col("v"))).as("p05"),
          max(when(col("rn") - 1 === floor((col("n") - 1) * lit(0.95)),
            col("v"))).as("p95"))
        t.join(q, Seq("lang"))
          .withColumn("w",
            when(col("v") < col("p05"), col("p05"))
              .when(col("v") > col("p95"), col("p95"))
              .otherwise(col("v")))
          .groupBy("lang", "p05", "p95")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("v") < col("p05"), 1).otherwise(0)).cast("long")
              .as("n_low"),
            sum(when(col("v") > col("p95"), 1).otherwise(0)).cast("long")
              .as("n_high"),
            round(sum(col("w").cast("decimal(38,0)")).cast("double") /
              count(lit(1)), 6).as("winsorized_mean"))
          .select(col("lang"), col("n_docs"), col("n_low"), col("n_high"),
            col("p05"), col("p95"), col("winsorized_mean"))
    },

    // Robust per-group outlier stats: median / MAD and the 3·MAD gate
    // over per-language document lengths — the curation filter that
    // survives heavy-tailed score distributions (one 10 MB boilerplate
    // doc moves a group's mean arbitrarily; it moves the median by one
    // rank). Medians are the EXACT lower order statistic (the q144
    // definition) so everything stays in the integer domain and the
    // threshold compares exactly across engines — no float tolerance.
    OpQuery.sql(
      "q159_mad_outlier_stats",
      """WITH t AS (SELECT lang AS key, n_chars AS v FROM documents),
        |r AS (SELECT key, v,
        |    row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY key) AS n FROM t),
        |med AS (SELECT key,
        |    max(CASE WHEN rn - 1 = floor((n - 1) * 0.5) THEN v END) AS med
        |  FROM r GROUP BY 1),
        |d AS (SELECT t.key, v, med, abs(v - med) AS dev
        |  FROM t JOIN med USING (key)),
        |r2 AS (SELECT key, dev,
        |    row_number() OVER (PARTITION BY key ORDER BY dev) AS rn,
        |    count(*) OVER (PARTITION BY key) AS n FROM d),
        |mad AS (SELECT key,
        |    max(CASE WHEN rn - 1 = floor((n - 1) * 0.5) THEN dev END) AS mad
        |  FROM r2 GROUP BY 1)
        |SELECT d.key AS lang, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  med, mad
        |FROM d JOIN mad USING (key)
        |GROUP BY 1, med, mad""".stripMargin) {
      (s, dir) =>
        graft.operators.RobustStats.madOutlierSummary(
            load(s, dir, "documents"), col("lang"), col("n_chars"), k = 3)
          .select(col("key").as("lang"), col("n_rows"), col("n_outliers"),
            col("med"), col("mad"))
    }
  )
}
