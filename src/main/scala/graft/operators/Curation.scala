package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and the final shuffle: benchmark decontamination, stratified sampling,
  * and sequence packing. All deterministic and engine-portable (md5
  * bucketing, no RNG state), so re-runs and the DuckDB oracle reproduce
  * results bit-for-bit.
  *
  * Scale design:
  *  - decontamination joins the CORPUS against the EVAL set — the eval
  *    side is bounded (benchmarks are thousands of docs, not billions),
  *    so its distinct-shingle set broadcasts and the corpus side streams
  *    map-side with zero shuffle of corpus bytes;
  *  - stratified sampling is a pure per-row filter (md5 of the id) — no
  *    shuffle, embarrassingly parallel, stable under repartitioning;
  *  - sequence packing shuffles once by pack bucket; each bucket packs
  *    independently (the standard sharded-packing design — global greedy
  *    packing would serialize on a single running total).
  */
object Curation {

  /** Domain-level quality curation (the RefinedWeb/DCLM pattern: curate
    * by SOURCE, not only by document): aggregate a per-doc quality score
    * to its registered domain, then drop every document of a domain
    * whose mean score falls below `minMean`.
    *
    * Engine-portable mean: per-doc scores are 6-decimal-rounded, so
    * they're exact in DECIMAL(18,6); the sum is order-independent and
    * the mean is ONE double division both engines perform identically —
    * no float-accumulation drift at the keep/drop boundary.
    *
    * Scale shape: the domain agg combines map-side (domains ≪ docs);
    * the flagged-domain list is small by construction and broadcast back,
    * so the per-doc pass never shuffles. Output (id, domain, keep).
    */
  def domainQualityFilter(
      docs: DataFrame,
      id: Column,
      domain: Column,
      score: Column,
      minMean: Double): DataFrame = {
    val d = docs.select(id.as("id"), domain.as("domain"), score.as("score"))
    val flagged = d.groupBy("domain")
      .agg((sum(col("score").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("mean"))
      .filter(col("mean") < minMean)
      .select(col("domain")).withColumn("__bad", lit(1))
    d.join(broadcast(flagged), Seq("domain"), "left")
      .select(col("id"), col("domain"),
        when(col("__bad").isNotNull, 0).otherwise(1).as("keep"))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct shingles with an evaluation set.
    *
    * `corpusShingles` / `evalShingles` = (id, shingle) DISTINCT pairs
    * (shingle n should be large enough to be discriminative — 5-grams
    * here vs the 3-grams dedup uses). The eval shingle set is broadcast:
    * eval benchmarks are small by construction, so contamination checking
    * a 100 TB corpus is one map-side semi-join plus a groupBy on the few
    * ids that overlap at all — corpus rows with no eval hit never shuffle.
    *
    * Output: (id, n_overlap, contaminated) for EVERY corpus id, including
    * zero-overlap ones (the left join back to ids is on the corpus's own
    * id set, shuffle on uniform ids).
    */
  def decontaminate(
      corpusIds: DataFrame,
      corpusShingles: DataFrame,
      evalShingles: DataFrame,
      minOverlap: Int = 1): DataFrame = {
    val evalSet = broadcast(evalShingles.select("shingle").distinct())
    val overlaps = corpusShingles
      .join(evalSet, Seq("shingle"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlap"))
    corpusIds
      .join(overlaps, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Bloom slot i of a shingle: md5("bf<i>|" + shingle) first 8 hex chars
    * mod `mBits` — deterministic, engine-portable (same conv trick as the
    * count-min sketch). */
  def bloomSlot(shingle: Column, i: Int, mBits: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"bf$i|"), shingle)), 1, 8), 16, 10)
      .cast("long"), lit(mBits.toLong))

  /** Bloom-filter decontamination — the memory-bounded twin of
    * [[decontaminate]]. Instead of broadcasting the eval shingle SET
    * (strings — gigabytes for a large eval suite), broadcast only its
    * bloom slots: `kHashes` md5-derived slots per shingle over an
    * `mBits`-slot space, ≤ mBits longs no matter how big the benchmark
    * suite grows. A corpus shingle counts as contaminated when ALL k of
    * its slots are set — deterministic FALSE POSITIVES at the usual
    * bloom rate (over-removal, the safe direction for decontamination)
    * and NO false negatives. The probe is k chained broadcast semi-joins
    * on the slot table, so corpus rows still never shuffle on the eval
    * side; everything is md5-derived, so an external engine rebuilds the
    * identical filter — false positives included (q86's oracle).
    */
  def decontaminateBloom(
      corpusIds: DataFrame,
      corpusShingles: DataFrame,
      evalShingles: DataFrame,
      mBits: Int,
      kHashes: Int,
      minOverlap: Int = 1): DataFrame = {
    require(mBits > 0 && kHashes >= 1, s"need mBits>0, kHashes>=1; got $mBits/$kHashes")
    val slots = (0 until kHashes)
      .map(i => evalShingles.select(bloomSlot(col("shingle"), i, mBits).as("slot")))
      .reduce(_ union _).distinct()
    val bloomHits = (0 until kHashes).foldLeft(corpusShingles) { (acc, i) =>
      acc.join(broadcast(slots),
        bloomSlot(col("shingle"), i, mBits) === col("slot"), "left_semi")
    }
    val overlaps = bloomHits.groupBy("id").agg(count(lit(1)).as("n_overlap"))
    corpusIds
      .join(overlaps, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Deterministic md5 sampling bucket in [0, buckets): the primitive under
    * split assignment and stratified sampling. Engine-portable (first 8 hex
    * chars of md5 of the id rendered as a string) and per-row independent.
    */
  def samplingBucket(id: Column, buckets: Int, salt: String = ""): Column =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Stratified sampling: keep each row with a per-stratum rate (e.g.
    * down-sample dominant languages, keep the tail whole) — the mixture-
    * rebalancing step of corpus assembly. `rates` maps stratum values to
    * keep-rates in [0, 1]; unlisted strata use `defaultRate`.
    *
    * Decision = samplingBucket(id, 1e6, salt) < rate * 1e6 — a pure
    * per-row predicate: no shuffle, reproducible under re-runs and
    * repartitioning, and independent of every other row, so the sample is
    * exactly re-derivable (a seeded `df.sample` is neither engine-portable
    * nor stable under partition changes). The rate table compiles to a
    * literal CASE chain — codegen'd, no join.
    */
  def stratifiedSample(
      df: DataFrame,
      stratum: Column,
      id: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = ""): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate)) { case ((k, r), acc) =>
      when(stratum === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(samplingBucket(id, 1000000, salt) < (rate * 1000000).cast("int"))
  }

  /** Deterministic FIXED-SIZE per-group sample: the k rows with the
    * smallest md5(salt + id) per group — a seeded shuffle ranking, so
    * "25 eval docs per source" is stable across runs, partitionings, and
    * engines (rate-based [[stratifiedSample]] can't pin exact counts; a
    * seeded `df.sample` pins neither count nor membership). Groups
    * smaller than k pass through whole.
    *
    * One shuffle on the group key; the rank<=k filter compiles to
    * Spark's WindowGroupLimit, which keeps a bounded k-row heap per
    * group on the map side instead of fully sorting each group — the
    * same property that makes distributed TakeOrdered scale.
    */
  def fixedSizeSample(
      df: DataFrame,
      group: Column,
      id: Column,
      k: Int,
      salt: String = "fss"): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(md5(concat(lit(salt), id.cast("string"))), id)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Deterministic WEIGHTED sample without replacement per group
    * (Efraimidis-Spirakis A-ES): each row draws u = md5-uniform(salt, id)
    * in (0, 1) and the k rows with the LARGEST ln(u)/weight win — the
    * classic one-pass distributed weighted reservoir, here as a window
    * rank so membership is stable across runs, partitionings, and
    * engines (the md5 draw and the ln are both replayable in SQL).
    * Heavier rows win proportionally more often; weights must be > 0.
    */
  def weightedSample(
      df: DataFrame,
      group: Column,
      id: Column,
      weight: Column,
      k: Int,
      salt: String = "ws"): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val u = (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    // enforce the documented weight > 0 contract IN the plan: weight = 0
    // yields ln(u)/0 = -Infinity here but NULL in a SQL oracle's
    // division, silently diverging sample membership between engines —
    // fail the job loudly instead of sampling differently
    val wChecked = when(weight <= 0 || weight.isNull, raise_error(concat(
      lit("weightedSample requires weight > 0, got "), weight.cast("string"))))
      .otherwise(weight.cast("double"))
    val key = log(u) / wChecked
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(key.desc, id)
    df.withColumn("__wrank", row_number().over(w))
      .filter(col("__wrank") <= k)
      .drop("__wrank")
  }

  /** Document chunking: split text into fixed-size overlapping windows
    * with character offsets — the text-splitting primitive under RAG
    * indexing and long-document pretraining. Pure per-row explode (no
    * shuffle); chunk starts step by `chunkChars - overlap`, the last
    * chunk may run short, empty docs yield no chunks.
    */
  def chunk(df: DataFrame, text: Column, chunkChars: Int, overlap: Int): DataFrame = {
    require(overlap < chunkChars, "overlap must be smaller than the chunk size")
    val step = chunkChars - overlap
    // last start caps at length - overlap: a start beyond that yields a
    // tail shorter than the overlap, i.e. a window wholly contained in
    // the previous chunk — pure duplicated text in the output.
    // greatest(..., 1) both keeps short docs to one chunk and guards
    // sequence(1, 0), which DESCENDS.
    val starts = when(length(text) > 0,
      sequence(lit(1), greatest(length(text) - overlap, lit(1)), lit(step)))
      .otherwise(array().cast("array<int>"))
    df.withColumn("chunk_start", explode(starts))
      .withColumn("chunk_idx", ((col("chunk_start") - 1) / step).cast("int"))
      .withColumn("chunk_text", text.substr(col("chunk_start"), lit(chunkChars)))
      .withColumn("chunk_len", length(col("chunk_text")))
  }

  /** Mixture-rate computation: given target corpus shares per source
    * (e.g. "wikipedia should be 20% of training tokens"), derive the
    * per-source repetition weight `rate = share × total_tokens /
    * source_tokens`. One aggregate over the corpus grouped by source
    * (map-side partial sums; source cardinality is tiny) — token sums
    * accumulate in DECIMAL so the result is aggregation-order-independent.
    * Sources without a target keep rate 1.0 (natural share).
    */
  def mixtureRates(
      df: DataFrame,
      source: Column,
      tokens: Column,
      targetShares: Map[String, Double]): DataFrame = {
    val perSource = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("decimal(27,0)")).as("n_tokens"))
    val share = targetShares.foldRight(lit(null).cast("double")) { case ((k, v), acc) =>
      when(col("source") === lit(k), lit(v)).otherwise(acc)
    }
    val total = perSource.agg(sum(col("n_tokens")).as("total_tokens"))
    perSource.crossJoin(broadcast(total)).select(
      col("source"), col("n_docs"),
      col("n_tokens").cast("long").as("n_tokens"),
      round(coalesce(
        share * col("total_tokens").cast("double") / col("n_tokens").cast("double"),
        lit(1.0)), 6).as("rate"))
  }

  /** Deterministic fractional repetition: emit `floor(w)` copies of each
    * row plus one more with probability `frac(w)` — md5-decided, so
    * w = 0.3 IS 30% downsampling, w = 2.5 is 2 or 3 copies, and the
    * realized corpus is exactly re-derivable (no RNG state). The standard
    * way a pipeline applies mixture weights: upsample high-quality
    * sources, downsample the rest, in one pass.
    *
    * Per-row explode, no shuffle. Output = input row + `copy_idx`
    * (1-based); rows whose weight rounds down to 0 copies disappear.
    * (`sequence(1, 0)` would yield a DESCENDING range in Spark, so the
    * copies >= 1 guard is mandatory, not cosmetic.)
    */
  def upsample(df: DataFrame, id: Column, weight: Column, salt: String = "up"): DataFrame = {
    // floor, not a bare cast: Spark truncates double→int, DuckDB rounds —
    // floor() is the one form both engines agree on
    val copies = (floor(weight) +
      when(samplingBucket(id, 1000000, salt) <
        floor((weight - floor(weight)) * 1000000).cast("int"), 1).otherwise(0)).cast("int")
    df.withColumn("copy_idx",
        explode(when(copies >= 1, sequence(lit(1), copies))
          .otherwise(array().cast("array<int>"))))
  }

  /** Sequence packing: lay documents end-to-end into fixed `budget`-token
    * training sequences. Docs are sharded into `buckets` independent pack
    * streams by md5(id), then packed in id order within each stream: a doc
    * STARTS in the sequence containing its cumulative token offset (docs
    * may straddle a boundary — the downstream tokenizer splits them, as in
    * standard packed-pretraining loaders).
    *
    * One shuffle (by bucket) + one window sort per bucket. Buckets scale
    * the parallelism: 100 TB / `buckets` must fit a single task's sort,
    * so size `buckets` ~ corpus_tokens / 10^9 in production. The window's
    * running sum is the only sequential dependency, and it is per-bucket.
    *
    * Output: (id, bucket, seq_id, seq_offset) — seq_id numbers sequences
    * within the bucket, seq_offset is the doc's first-token position
    * within its starting sequence.
    */
  def packSequences(
      df: DataFrame,
      id: Column,
      tokens: Column,
      budget: Int,
      buckets: Int): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(id.as("id"), tokens.as("n_tokens"),
        samplingBucket(id, buckets, "pack").as("bucket"))
      .withColumn("cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(
        col("id"), col("bucket"),
        floor(col("cum") / budget).cast("long").as("seq_id"),
        (col("cum") % budget).cast("long").as("seq_offset"))
  }
}
