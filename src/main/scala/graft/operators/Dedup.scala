package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact (hash group-by), MinHash+LSH banding, SimHash,
  * and n-gram Jaccard verification.
  *
  * Scale design: everything is shuffle-by-key. Exact dedup shuffles on the
  * content hash (uniform). MinHash/LSH shuffles on band keys — each doc
  * emits `bands` rows, and candidate generation is an equi-join on band
  * key, never an all-pairs product. The Jaccard verify runs only on LSH
  * candidates. At 100 TB the only skew risk is a degenerate band key
  * (e.g. empty docs); filter empties first.
  */
object Dedup {

  /** Exact dedup: group by md5 of (optionally normalized) content, keep the
    * smallest id as the canonical representative.
    */
  def exact(df: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    df.select(col(idCol), keyExpr.as("content_hash"))
      .groupBy("content_hash")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash + LSH banding as an explode/aggregate pipeline over an
    * exploded (id, shingle) relation — NOT nested array lambdas: a per-row
    * `transform(sequence(k), j -> array_min(transform(shingles, md5)))`
    * expression tree duplicates k× through Catalyst and blows up codegen
    * compile time (hundreds of seconds at ANY data size), and its wide
    * rows don't partial-aggregate. The relational form shuffles by
    * (id, j) with map-side partial MIN and scales linearly.
    *
    * Hash j of a doc = min over its shingles of `md5(j || '|' || shingle)`
    * — md5-seeded so the signature is engine-portable (the DuckDB oracle
    * reproduces it bit-for-bit) and deterministic with no RNG.
    *
    * Input: (id, shingle) distinct pairs. Output: (id, band, bkey) — one
    * row per doc per band; `bkey` concatenates the band's `rowsPerBand`
    * minhashes in j order.
    */
  def minhashBands(docShingles: DataFrame, k: Int, rowsPerBand: Int): DataFrame =
    bandsFromMinhashes(minhashes(docShingles, k), rowsPerBand)

  /** The k minhashes alone — (id, j, h), one row per doc per hash index.
    * Split out of [[minhashBands]] (r16) so a parameter sweep over
    * several (bands, rowsPerBand) splits of the SAME k hashes computes
    * the md5 minimization once (cache this frame), paying per config
    * only the cheap band regrouping in [[bandsFromMinhashes]]. */
  def minhashes(docShingles: DataFrame, k: Int): DataFrame =
    docShingles
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("h", md5(concat(col("j").cast("string"), lit("|"), col("shingle"))))
      .groupBy("id", "j")
      .agg(min("h").as("h"))

  /** Group (id, j, h) minhashes into band keys — the second half of
    * [[minhashBands]]. */
  def bandsFromMinhashes(mh: DataFrame, rowsPerBand: Int): DataFrame =
    mh
      .withColumn("band", (col("j") / rowsPerBand).cast("int"))
      .groupBy("id", "band")
      .agg(graft.functions.MysqlFunctions.groupConcat(col("h"), Seq(col("j")), "").as("bkey"))

  /** Candidate pairs (a < b) sharing at least one LSH band key: equi-join
    * on (band, bkey) — shuffles by band key, never an all-pairs product.
    * Input: (id, band, bkey). Output: (id_a, id_b) distinct.
    */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    val l = bands.select(col("band"), col("bkey"), col("id").as("id_a"))
    val r = bands.select(col("band"), col("bkey"), col("id").as("id_b"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** [[lshCandidatePairs]] with a per-bucket population cap — the
    * adversarial-input guard at corpus scale: a boilerplate band shared
    * by B documents yields B²/2 candidate pairs, so one hot bucket (a
    * license header, a template page) can dominate the whole verify
    * stage. Buckets above `maxBucket` are dropped ENTIRELY (the cap is a
    * documented recall tradeoff, not a sample: docs agreeing only on a
    * hot band are overwhelmingly boilerplate-similar, and genuinely
    * near-dup docs agree on several bands, so they survive via their
    * cooler ones). Deterministic — the count filter is exact — so the
    * q91 oracle replays the cap, including exactly which pairs it costs.
    */
  def lshCandidatePairsCapped(bands: DataFrame, maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val cool = bands
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    lshCandidatePairs(cool)
  }

  /** Candidate pairs involving at least one NEW doc, against a STORED
    * band index: new-vs-stored equi-join on (band, bkey) plus
    * new-vs-new — the corpus's bands are read from the index, never
    * recomputed, so a daily ingest's dedup cost scales with the delta
    * (|new| × bands joined against the index), not the corpus. The
    * batch analogue of the ETL stages' watermark incrementals. Callers
    * keep new ids disjoint from stored ids; output (id_a < id_b)
    * distinct, same shape as [[lshCandidatePairs]].
    */
  def lshCandidatePairsIncremental(
      storedBands: DataFrame, newBands: DataFrame): DataFrame = {
    val s = storedBands.select(col("band"), col("bkey"), col("id").as("id_s"))
    val n = newBands.select(col("band"), col("bkey"), col("id").as("id_n"))
    val newVsStored = n.join(s, Seq("band", "bkey"))
      .select(least(col("id_n"), col("id_s")).as("id_a"),
        greatest(col("id_n"), col("id_s")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // new-vs-new inlined (not via lshCandidatePairs) so the union is
    // deduped ONCE — composing would shuffle the new pairs through a
    // second distinct
    val newVsNew = n.join(
        newBands.select(col("band"), col("bkey"), col("id").as("id_b")),
        Seq("band", "bkey"))
      .filter(col("id_n") < col("id_b"))
      .select(col("id_n").as("id_a"), col("id_b"))
    newVsStored.union(newVsNew).distinct()
  }

  /** Exact Jaccard similarity over shingle sets for given candidate pairs —
    * the verify stage after [[lshCandidatePairs]]. `docShingles` = (id,
    * shingle) distinct; `pairs` = (id_a, id_b). |A ∩ B| / |A ∪ B| with
    * exact integer set sizes; the division is deterministic f64.
    */
  def jaccardVerify(docShingles: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = docShingles.groupBy("id").agg(count(lit(1)).as("n"))
    val shared = pairs
      .join(docShingles.select(col("id").as("id_a"), col("shingle").as("s")), Seq("id_a"))
      .join(docShingles.select(col("id").as("id_b"), col("shingle").as("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken — the MOSS
    * algorithm): per position, the MINIMUM k-gram hash over a sliding
    * window of `w` consecutive k-grams; the doc's fingerprint set is
    * the distinct window minima. The guarantee MinHash doesn't give:
    * any shared run of at least w + k - 1 tokens between two documents
    * is CERTAIN to share a fingerprint (both sides' windows over the
    * run see the same minimum) — detection of long verbatim overlap is
    * deterministic, not probabilistic. Cost: one window pass per doc
    * (shuffle by doc, sort by position) + a distinct; the cross-doc
    * join shuffles by fingerprint, never all-pairs.
    *
    * `positional`: (id, pos, gram) — consecutive k-grams IN ORDER (the
    * posexploded shingle array). Returns distinct (id, fp). */
  def winnowFingerprints(positional: DataFrame, w: Int): DataFrame = {
    require(w >= 1)
    val hashed = positional.select(col("id"), col("pos"),
      conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long").as("h"))
    val win = Window.partitionBy("id").orderBy("pos")
    hashed
      .withColumn("fp", min("h").over(win.rowsBetween(0, w - 1)))
      // only FULL windows define fingerprints — a tail window of fewer
      // than w grams would mint fingerprints the guarantee doesn't cover
      .withColumn("n", count(lit(1)).over(Window.partitionBy("id")))
      .filter(col("pos") <= col("n") - w)
      .select(col("id"), col("fp"))
      .distinct()
  }

  /** Cross-document overlap via shared winnowing fingerprints: pairs
    * ordered (id_a < id_b) with their shared-fingerprint count — the
    * long-verbatim-overlap report. */
  def winnowOverlapPairs(fingerprints: DataFrame, minShared: Int): DataFrame =
    fingerprints.select(col("id").as("id_a"), col("fp"))
      .join(fingerprints.select(col("id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)

  /** Directional CONTAINMENT verify — the asymmetric companion to
    * [[jaccardVerify]] for the quote-inclusion modality Jaccard
    * misses: a short document wholly quoted inside a long one has
    * containment(A in B) ≈ 1 while Jaccard ≈ |A|/|B| ≈ 0, so a
    * symmetric threshold never fires. Same joins and shuffle shape as
    * the Jaccard verify (per-pair shared-shingle count + per-doc
    * sizes); emits both directions plus the Jaccard so one pass serves
    * both decision rules. */
  def containmentVerify(docShingles: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = docShingles.groupBy("id").agg(count(lit(1)).as("n"))
    val shared = pairs
      .join(docShingles.select(col("id").as("id_a"), col("shingle").as("s")), Seq("id_a"))
      .join(docShingles.select(col("id").as("id_b"), col("shingle").as("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("n_shared").cast("double") / col("n_a"), 6)
          .as("containment_a"),
        round(col("n_shared").cast("double") / col("n_b"), 6)
          .as("containment_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }

  /** [[jaccardVerify]] with BOUNDED per-pair cost — the guard for hot
    * candidate sets against huge documents, where the exact verify's
    * explode multiplies (pairs x shingles). Each doc is reduced to its
    * BOTTOM-K shingle sketch (the k smallest md5(shingle) values — a
    * deterministic, engine-replayable sample), and the pair's Jaccard is
    * the standard bottom-k estimate: of the k smallest hashes of the
    * sketch UNION, the fraction present in both sketches. Per pair the
    * verify now touches <= 2k rows however large the documents are; the
    * estimate is EXACT whenever |A ∪ B| <= k (sketches are then complete
    * sets) and has the usual ~1/sqrt(k) standard error above it —
    * over-threshold dedup decisions degrade gracefully, and the safe
    * direction (near-dup pairs estimated slightly off) is tunable with k.
    * Input/output shapes match [[jaccardVerify]]; `jaccard` is the
    * estimate. */
  def jaccardVerifyBounded(docShingles: DataFrame, pairs: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"sketch size must be >= 1, got $k")
    val wDoc = Window.partitionBy("id").orderBy("h")
    val sk = docShingles
      .select(col("id"), md5(col("shingle")).as("h"))
      .withColumn("__rn", row_number().over(wDoc))
      .filter(col("__rn") <= k)
      .drop("__rn")
    // tag each sketch hash with its side, union, then resolve membership
    // per (pair, hash) — never more than 2k rows per pair enter the merge
    val a = pairs.join(sk.select(col("id").as("id_a"), col("h")), Seq("id_a"))
      .select(col("id_a"), col("id_b"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
    val b = pairs.join(sk.select(col("id").as("id_b"), col("h")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("h"), lit(0).as("in_a"), lit(1).as("in_b"))
    val merged = a.union(b)
      .groupBy("id_a", "id_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    // bottom-k of the union sketch, then the shared fraction within it
    val wPair = Window.partitionBy("id_a", "id_b").orderBy("h")
    merged
      .withColumn("__rn", row_number().over(wPair))
      .filter(col("__rn") <= k)
      .groupBy("id_a", "id_b")
      .agg(
        sum(col("in_a") * col("in_b")).as("c"),
        count(lit(1)).as("m"))
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / col("m"), 6).as("jaccard"))
  }

  /** Bounded containment estimate — [[containmentVerify]]'s per-pair
    * cost capped the way [[jaccardVerifyBounded]] caps Jaccard's: both
    * sides reduce to bottom-k md5 sketches, the pair's union sketch is
    * re-cut to its k smallest, and the directional estimates are
    * C(A in B) ≈ |S∩A∩B| / |S∩A| (exact when |A ∪ B| <= k, standard
    * bottom-k error above it). At most 2k rows per pair enter the
    * merge, however large the documents — the quote-inclusion check
    * for hot candidate sets against huge docs. A side unrepresented in
    * the union's bottom-k yields NULL rather than a fabricated ratio.
    */
  def containmentVerifyBounded(docShingles: DataFrame, pairs: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"sketch size must be >= 1, got $k")
    val wDoc = Window.partitionBy("id").orderBy("h")
    val sk = docShingles
      .select(col("id"), md5(col("shingle")).as("h"))
      .withColumn("__rn", row_number().over(wDoc))
      .filter(col("__rn") <= k)
      .drop("__rn")
    val a = pairs.join(sk.select(col("id").as("id_a"), col("h")), Seq("id_a"))
      .select(col("id_a"), col("id_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val b = pairs.join(sk.select(col("id").as("id_b"), col("h")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val merged = a.union(b)
      .groupBy("id_a", "id_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wPair = Window.partitionBy("id_a", "id_b").orderBy("h")
    merged
      .withColumn("__rn", row_number().over(wPair))
      .filter(col("__rn") <= k)
      .groupBy("id_a", "id_b")
      .agg(sum(col("in_a") * col("in_b")).as("c"),
        sum(col("in_a")).as("na"), sum(col("in_b")).as("nb"),
        count(lit(1)).as("m"))
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / nullif(col("na"), lit(0)), 6)
          .as("containment_a"),
        round(col("c").cast("double") / nullif(col("nb"), lit(0)), 6)
          .as("containment_b"),
        round(col("c").cast("double") / col("m"), 6).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard above a threshold via inverted-index join on
    * the exploded (id, shingle) relation (exact but quadratic in per-shingle
    * posting lists; compose [[minhashBands]] → [[lshCandidatePairs]] →
    * [[jaccardVerify]] at scale).
    */
  def ngramJaccardPairs(docShingles: DataFrame, threshold: Double): DataFrame = {
    val sizes = docShingles.groupBy("id").agg(count(lit(1)).as("n"))
    val pairs = docShingles.select(col("id").as("id_a"), col("shingle").as("s"))
      .join(docShingles.select(col("id").as("id_b"), col("shingle").as("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash-banded near-dup pairs — the Hamming-space analogue of the
    * MinHash LSH path: the 60-bit signature ([[TextAnalysis.simhash60]])
    * splits into 4 aligned 15-bit bands, docs sharing ANY band value
    * become candidates (equi-join on (band, value) — never an all-pairs
    * product), and candidates are verified by exact Hamming distance.
    * Pigeonhole gives TOTAL recall for distance <= 3 (a pair differing
    * in at most 3 bits has at least one intact band); larger
    * `maxHamming` thresholds are verified correctly but found only when
    * a band happens to survive. Cost scales with band-bucket
    * collisions, like every LSH family here — and 15-bit bands keep
    * chance bucket collisions (2^-15 per band pair) from flooding the
    * verify stage the way 4-bit bands of a 16-bit signature did.
    *
    * `docs` must carry unique ids; output (id_a < id_b, hamming)
    * distinct.
    */
  /** (id, sig): 60-bit SimHash signatures computed aggregation-shaped —
    * explode to (id, token), then 60 codegen'd conditional SUMs with
    * map-side partials, then one sum-of-whens assembly. Identical math
    * to [[TextAnalysis.simhash60]] (spec-asserted), but the per-token
    * cost is 60 whole-stage-codegen'd comparisons instead of an
    * interpreted 60-wide zip_with fold — the array-HOF form measured
    * 5x slower on the corpus scan (the same blowup minhashBands hit).
    */
  def simhash60Frame(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.words(TextAnalysis.normalize(text))).as("t"))
      .select(col("id"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
    val sums = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$b"))
    toks.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"), (0 until 60).map(b =>
        when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("sig"))
  }

  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      sig: Column,
      maxHamming: Int = 3): DataFrame = {
    val s = docs.select(col(idCol).as("id"), sig.as("sig"))
    val bands = s.select(col("id"), col("sig"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * 15).bitwiseAND(lit(32767L)).as("bval"))): _*))
          .as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val l = bands.select(col("band"), col("bval"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = bands.select(col("band"), col("bval"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct() // a pair can match on several bands; verify once
      .withColumn("hamming",
        graft.operators.TextAnalysis.hamming(col("sig_a"), col("sig_b")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Corpus-wide line/paragraph dedup (the CCNet recipe): split each doc on
    * `sep`, drop every copy of a line that appears elsewhere in the corpus
    * EXCEPT the globally-first occurrence (smallest (doc, position)), and
    * reassemble the survivors in original order. Boilerplate (headers,
    * cookie banners, license blocks) dies corpus-wide while the one
    * canonical copy survives.
    *
    * `keepFirst = false` switches to the harsher drop-all rule: any line
    * occurring more than once vanishes everywhere.
    *
    * Scale shape: explode is map-side; the winner per line is a partial-
    * aggregatable `min(struct(doc, pos))` — NOT a `row_number() over
    * (partition by line)` window, which would sort every copy of a hot
    * boilerplate line inside one partition. The agg form combines map-side,
    * so a line duplicated 10M times costs one row per input partition at
    * the shuffle. Reassembly groups by doc (second keyed shuffle) with the
    * same sorted-collect used everywhere else in the repo.
    *
    * Output: (id, text, n_lines, n_kept) — `text` empty-string when every
    * line was dropped. An empty text is one empty line (split's behavior),
    * and empty lines dedup like any other line — blank-paragraph runs are
    * exactly the boilerplate this pass exists to kill.
    */
  def dedupLines(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      sep: String = "\n",
      keepFirst: Boolean = true): DataFrame = {
    val lines = explodeLines(docs, idCol, textCol, sep)
    val counts = lines.groupBy("line").agg(
      count(lit(1)).as("n_copies"),
      min(struct(col("id"), col("pos"))).as("first_occ"))
    val kept =
      if (keepFirst)
        // unique lines are trivially their own first occurrence, so the
        // whole rule is "I am the global min (doc, pos) for my line"
        lines.join(counts, Seq("line"))
          .filter(col("first_occ.id") === col("id") && col("first_occ.pos") === col("pos"))
      else
        lines.join(counts.filter(col("n_copies") === 1).select("line"), Seq("line"))
    reassemble(docs, idCol, textCol, sep, kept)
  }

  /** O(delta) line-dedup ingest: dedup ONLY the new documents against a
    * stored line index (the existing corpus's distinct lines — exactly
    * what a production pipeline persists between ticks) plus keep-first
    * within the delta. Stored lines always win: they arrived earlier, so
    * any new copy of an indexed line drops; lines first seen inside the
    * delta keep their min-(doc, pos) copy as in [[dedupLines]]. When new
    * ids sort after stored ids this equals the full-corpus keep-first
    * restricted to the new docs — which is what the q106 oracle asserts.
    *
    * Cost: the delta's lines anti-join the index BY LINE KEY — shuffle
    * O(|delta lines| + matching index slice), never a corpus rescan; the
    * index grows by the delta's surviving distinct lines (append-only).
    */
  def dedupLinesIncremental(
      newDocs: DataFrame,
      idCol: String,
      textCol: Column,
      storedLines: DataFrame, // (line) — distinct lines of the stored corpus
      sep: String = "\n"): DataFrame = {
    val lines = explodeLines(newDocs, idCol, textCol, sep)
    val fresh = lines.join(storedLines.select("line"), Seq("line"), "left_anti")
    val winners = fresh.groupBy("line")
      .agg(min(struct(col("id"), col("pos"))).as("first_occ"))
    val kept = fresh.join(winners, Seq("line"))
      .filter(col("first_occ.id") === col("id") && col("first_occ.pos") === col("pos"))
    reassemble(newDocs, idCol, textCol, sep, kept)
  }

  private def explodeLines(
      docs: DataFrame, idCol: String, textCol: Column, sep: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(textCol, java.util.regex.Pattern.quote(sep))))
      .toDF("id", "pos", "line")

  private def reassemble(
      docs: DataFrame, idCol: String, textCol: Column, sep: String,
      kept: DataFrame): DataFrame = {
    val rebuilt = kept
      .groupBy("id")
      .agg(
        array_join(array_sort(collect_list(struct(col("pos"), col("line"))))
          .getField("line"), sep).as("text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol).as("id"),
        size(split(textCol, java.util.regex.Pattern.quote(sep))).as("n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text"), lit("")).as("text"),
        col("n_lines").cast("long").as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Per-document duplicated-span signal — the relational reduction of
    * suffix-array substring dedup: every shared substring of >= L tokens
    * is a run of shared length-L token grams, so "how much of this doc is
    * duplicated text" = the fraction of its L-gram INSTANCES whose gram
    * occurs >= 2 times corpus-wide (same-doc repeats count — internal
    * boilerplate is duplication too). Downstream policy can drop, trim,
    * or deprioritize by `dup_frac`.
    *
    * Input: `gramsCol` an array of gram strings per doc (instances, not
    * distinct). Scale shape: explode to instance grain; gram totals are a
    * map-side-combinable count (a viral gram costs one row per input
    * partition at the shuffle); join-back is keyed on the gram; the
    * per-doc rollup is the third keyed shuffle. No all-pairs anywhere —
    * the corpus-sized frames only ever move by (gram) or (id).
    *
    * Output: (id, n_grams, n_dup_grams, dup_frac), one row per doc with
    * at least one gram.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, gramsCol: Column): DataFrame = {
    val inst = docs.select(col(idCol).as("id"), explode(gramsCol).as("gram"))
    val counts = inst.groupBy("gram").agg(count(lit(1)).as("n_occ"))
    inst.join(counts, Seq("gram"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac", round(col("n_dup_grams") / col("n_grams"), 6))
  }

  /** EDIT-DISTANCE (fuzzy) join via q-gram filtering: candidate pairs
    * share at least one positional-independent q-gram AND differ in
    * length by at most `maxDist`; candidates verify with exact
    * Levenshtein. For strings of length L with a single substitution,
    * at most q grams die, so any pair within distance d shares a gram
    * whenever L - (q-1) > d*q — with q=3 and keys of a dozen-plus
    * characters that's TOTAL recall at d=1 (the fuzzy-key dedup case:
    * typo'd titles, OCR'd identifiers). The join moves only (id, gram)
    * pairs and shuffles by gram — never all-pairs; hot grams cost
    * collisions like every LSH family here.
    *
    * Output (id_a < id_b, dist <= maxDist), distinct.
    */
  def editDistancePairs(
      docs: DataFrame,
      id: Column,
      key: Column,
      maxDist: Int = 1,
      q: Int = 3,
      maxGramDf: Int = 1000): DataFrame = {
    val k = docs.select(id.as("id"), key.as("k"))
    val allGrams = k.select(col("id"), col("k"),
        // greatest(..., 1) keeps the sequence ascending for short keys
        // (Spark's sequence(1, 0) would DESCEND); their undersized
        // grams are dropped by the length filter below
        explode(transform(
          sequence(lit(1), greatest(length(col("k")) - (q - 1), lit(1))),
          i => col("k").substr(i, lit(q)))).as("gram"))
      .filter(length(col("gram")) === q)
      .distinct()
    // HOT-GRAM cap: a gram present in more than `maxGramDf` keys (a
    // shared prefix, boilerplate) is non-selective — joining on it is
    // the all-pairs product this filter family exists to avoid. Recall
    // caveat (the standard q-gram-join trade): a pair must share a
    // gram that SURVIVES the cap; near-dup keys share many grams, so
    // in practice only pairs made entirely of corpus-universal grams
    // are lost.
    val gramDf = allGrams.groupBy("gram").agg(count(lit(1)).as("gdf"))
    val grams = allGrams.join(
      gramDf.filter(col("gdf") <= maxGramDf).select("gram"), Seq("gram"))
    val l = grams.select(col("gram"), col("id").as("id_a"), col("k").as("k_a"))
    val r = grams.select(col("gram"), col("id").as("id_b"), col("k").as("k_b"))
    l.join(r, Seq("gram"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("k_a")) - length(col("k_b"))) <= maxDist)
      .select("id_a", "id_b", "k_a", "k_b")
      .distinct() // a pair can share many grams; verify once
      .withColumn("dist", levenshtein(col("k_a"), col("k_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Gear multiplier for content-defined chunking: Knuth's multiplicative
    * constant maps each character to a pseudo-random byte with no lookup
    * table — replayable as plain arithmetic in any engine. */
  def gearByte(c: Int): Int = ((c * 2654435761L) % 256L).toInt

  /** CONTENT-DEFINED chunking dedup (the Gear/FastCDC family, pure
    * content-defined form): a rolling hash h = ((h << 1) + gear(byte))
    * cuts a chunk wherever `h & mask == 0`, so chunk boundaries move
    * WITH the content — inserting one character early in a document
    * shifts fixed-size blocks everywhere but re-synchronizes
    * content-defined cuts within one chunk, which is why storage dedup
    * and long-document near-dup both use it. Expected chunk length is
    * mask + 1 characters.
    *
    * Because only the low log2(mask+1) bits decide a cut, the boundary
    * at position i depends on just the last 6 characters (for mask 63)
    * — the sequential-looking roll is actually a sliding 6-term window,
    * which is what lets the DuckDB oracle replay every cut without
    * recursion. (Production CDC adds min/max chunk clamps, which
    * reintroduce a sequential dependency; the pure form is the
    * parallel-replayable core.)
    *
    * Input text should be normalized single-byte ([[TextAnalysis.normalize]]
    * output) so character and byte offsets agree across engines.
    * Output: (doc_id, chunk_idx, chunk_len, chunk_md5, n_copies) — one
    * row per chunk, with its corpus-wide copy count (n_copies >= 2 =
    * this span exists verbatim elsewhere). Scale shape: per-doc chunking
    * is map-side; the copy count is one keyed shuffle on the chunk
    * content, map-side-combinable like every hot-key count here.
    */
  def gearChunkDedup(
      docs: DataFrame,
      id: Column,
      text: Column,
      mask: Int = 63): DataFrame = {
    require((mask & (mask + 1)) == 0 && mask >= 1, s"mask must be 2^k - 1, got $mask")
    import docs.sparkSession.implicits._
    val chunks = docs.select(id.cast("long").as("did"), text.as("t"))
      .as[(Long, String)]
      .flatMap { case (did, t) =>
        val s = Option(t).getOrElse("")
        if (s.isEmpty) Iterator.empty
        else {
          val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
          var h = 0
          var i = 0
          while (i < s.length) {
            h = ((h << 1) + gearByte(s.charAt(i).toInt)) & mask
            if (h == 0) cuts += (i + 1)
            i += 1
          }
          if (cuts.isEmpty || cuts.last != s.length) cuts += s.length
          var prev = 0
          cuts.iterator.zipWithIndex.map { case (c, idx) =>
            val chunk = s.substring(prev, c)
            prev = c
            (did, idx, chunk)
          }
        }
      }.toDF("doc_id", "chunk_idx", "chunk")
    val counts = chunks.groupBy("chunk").agg(count(lit(1)).as("n_copies"))
    chunks.join(counts, Seq("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        length(col("chunk")).as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"), col("n_copies"))
  }
}
