package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class CurationSpec extends SparkSuite {

  test("decontaminate flags docs overlapping the eval set and only those") {
    import spark.implicits._
    // doc 1 shares its full text with eval doc 10; doc 2 is clean; doc 3
    // shares nothing but a sub-n-gram-length fragment
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta unrelated tail words here")).toDF("id", "text")
    val eval = Seq((10L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"), explode(TextAnalysis.shingles(
        TextAnalysis.words(TextAnalysis.normalize(col("text"))), 5)).as("shingle"))
      .distinct()
    val out = Curation.decontaminate(corpus.select("id"), sh(corpus), sh(eval))
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    assert(out(1L) == ((2L, true)))  // 6 words -> two 5-grams, both shared
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((0L, false)))
  }

  test("bloom decontamination never misses an exact hit; roomy filter adds none") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"), explode(TextAnalysis.shingles(
        TextAnalysis.words(TextAnalysis.normalize(col("text"))), 5)).as("shingle"))
      .distinct()
    val evalDocs = docs.limit(20)
    def flagged(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("contaminated")).select("id")
        .collect().map(_.getLong(0)).toSet
    val exact = flagged(
      Curation.decontaminate(docs.select("id"), sh(docs), sh(evalDocs)))
    // a CRAMPED filter (256 slots): false positives certain, false
    // negatives structurally impossible
    val cramped = flagged(Curation.decontaminateBloom(
      docs.select("id"), sh(docs), sh(evalDocs), mBits = 256, kHashes = 3))
    assert(exact.subsetOf(cramped), "bloom missed an exact contamination hit")
    // a ROOMY filter (1M slots) matches the exact answer on this corpus
    val roomy = flagged(Curation.decontaminateBloom(
      docs.select("id"), sh(docs), sh(evalDocs), mBits = 1 << 20, kHashes = 3))
    assert(roomy == exact)
  }

  test("stratifiedSample keeps rates approximately and is exactly re-derivable") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "rare"))
      .toDF("doc_id", "lang")
    val sampled = Curation.stratifiedSample(
      df, col("lang"), col("doc_id"), Map("en" -> 0.25), defaultRate = 1.0, salt = "t")
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("rare") == 1000L) // default rate 1.0 keeps everything
    assert(byLang("en") > 150 && byLang("en") < 350) // ~250 of 1000
    // deterministic: a second run yields the identical id set
    val again = Curation.stratifiedSample(
      df.repartition(7), col("lang"), col("doc_id"), Map("en" -> 0.25), 1.0, "t")
    assert(sampled.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("fixedSizeSample: exact per-group counts, stable membership, grouped limit plan") {
    import spark.implicits._
    // group a: 40 rows, b: 7 (< k, passes whole), c: 12
    val rows = (1 to 40).map(i => (i.toLong, "a")) ++
      (41 to 47).map(i => (i.toLong, "b")) ++ (48 to 59).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "g")
    val got = Curation.fixedSizeSample(df, col("g"), col("id"), k = 10)
      .as[(Long, String)].collect().toSet
    val counts = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts == Map("a" -> 10, "b" -> 7, "c" -> 10))

    // membership is a pure function of (salt, id): repartitioning must
    // not move the sample
    val reGot = Curation.fixedSizeSample(df.repartition(7, col("id")),
      col("g"), col("id"), k = 10).as[(Long, String)].collect().toSet
    assert(reGot == got)

    // rank<=k plans as a grouped limit, not a full per-group sort pass
    val plan = Curation.fixedSizeSample(df, col("g"), col("id"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("mixtureRates derives rate = share * total / source_tokens") {
    import spark.implicits._
    // src_a: 100 tokens, src_b: 300 tokens -> total 400
    val df = Seq(("a1", "src_a", "w " * 99 + "w"), ("b1", "src_b", "w " * 299 + "w"))
      .toDF("id", "source", "text")
    val out = Curation.mixtureRates(df, col("source"),
        TextAnalysis.tokenCountWhitespace(col("text")), Map("src_a" -> 0.5))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("src_a") == (("src_a", 1L, 100L, 2.0))) // 0.5 * 400 / 100
    assert(out("src_b") == (("src_b", 1L, 300L, 1.0))) // no target -> natural
  }

  test("upsample emits floor(w) copies plus an md5-decided fractional one") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, if (i % 2 == 0) "keep3" else "drop"))
      .toDF("doc_id", "kind")
    val w = when(col("kind") === "keep3", 3.0).otherwise(0.25)
    val out = Curation.upsample(df, col("doc_id"), w)
    val byKind = out.groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(byKind("keep3") == 1500L) // exactly 3 copies each
    assert(byKind("drop") > 50 && byKind("drop") < 200) // ~125 of 500
    // copy indices are dense 1..n per doc
    val idx = out.filter(col("kind") === "keep3").groupBy("doc_id")
      .agg(sort_array(collect_list("copy_idx")).as("idx"))
      .select("idx").distinct().as[Seq[Int]].collect()
    assert(idx.toSeq == Seq(Seq(1, 2, 3)))
    // deterministic under repartitioning
    val again = Curation.upsample(df.repartition(13), col("doc_id"), w)
    assert(out.count() == again.count())
  }

  test("weightedSample fails loudly on weight <= 0 instead of diverging") {
    import spark.implicits._
    // ln(u)/0 = -Infinity in Spark but NULL in a SQL oracle's division —
    // sample membership would silently differ between engines, so the
    // documented weight > 0 contract is enforced in the plan
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, 1.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Curation.weightedSample(df, lit(1), col("id"), col("w"), 2).collect()
    }
    assert(e.getMessage.contains("weight > 0"))
    // all-positive weights still sample fine
    val ok = Curation.weightedSample(
      df.filter(col("w") > 0), lit(1), col("id"), col("w"), 2)
    assert(ok.count() == 2)
  }

  test("plan shapes: broadcast eval set, shuffle-free sample, one-shuffle pack") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, s"w$i " * 8, "en")).toDF("id", "text", "lang")
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"), explode(TextAnalysis.shingles(
        TextAnalysis.words(TextAnalysis.normalize(col("text"))), 5)).as("shingle"))
      .distinct()
    // eval side must broadcast: the 100 TB corpus never shuffles for it
    val decon = Curation.decontaminate(docs.select("id"), sh(docs), sh(docs.limit(5)))
    decon.write.format("noop").mode("overwrite").save()
    assert(decon.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"eval set should broadcast:\n${decon.queryExecution.executedPlan}")
    // sampling is a pure per-row filter: no Exchange anywhere
    val sampled = Curation.stratifiedSample(
      docs.toDF("doc_id", "text", "lang"), col("lang"), col("doc_id"), Map("en" -> 0.5))
    sampled.write.format("noop").mode("overwrite").save()
    assert(Bucketing.isShuffleFree(sampled),
      s"sampling must not shuffle:\n${sampled.queryExecution.executedPlan}")
    // packing shuffles exactly once (by pack bucket); the window reuses it
    val packed = Curation.packSequences(
      docs.toDF("doc_id", "text", "lang"), col("doc_id"), lit(8L), 64, 4)
    packed.write.format("noop").mode("overwrite").save()
    val nExchanges = "Exchange hashpartitioning".r
      .findAllIn(packed.queryExecution.executedPlan.toString).size
    assert(nExchanges == 1,
      s"expected exactly one shuffle:\n${packed.queryExecution.executedPlan}")
  }

  test("chunk covers the text exactly with the configured overlap") {
    import spark.implicits._
    val df = Seq((1L, "a" * 500), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = Curation.chunk(df, col("text"), chunkChars = 200, overlap = 40)
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
      .as[(Long, Int, Int, Int)].collect().sorted.toSeq
    // doc 1: starts 1, 161, 321 -> lens 200, 200, 180. No start beyond
    // length - overlap = 460: a chunk at 481 would cover 481-500, wholly
    // inside the 321-500 chunk — duplicated text.
    assert(out == Seq(
      (1L, 0, 1, 200), (1L, 1, 161, 200), (1L, 2, 321, 180),
      (2L, 0, 1, 2)))
    // reassembly: dropping each chunk's overlap prefix reconstructs the doc
    val text = Curation.chunk(df.filter(col("doc_id") === 1), col("text"), 200, 40)
      .orderBy("chunk_start")
      .select("chunk_text").as[String].collect()
      .zipWithIndex.map { case (c, i) => if (i == 0) c else c.drop(40) }.mkString
    assert(text == "a" * 500)
  }

  test("packSequences is gapless and order-faithful within each bucket") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"doc $i ${"w " * (i % 50)}"))
      .toDF("doc_id", "text")
    val toks = TextAnalysis.tokenCountWhitespace(col("text")).cast("long")
    val packed = Curation.packSequences(df, col("doc_id"), toks, budget = 64, buckets = 4)
      .join(df.select(col("doc_id").as("id"), toks.as("n")), Seq("id"))
      .as[(Long, Int, Long, Long, Long)].collect()
      .groupBy(_._2) // bucket
    assert(packed.keySet.subsetOf((0 until 4).toSet))
    packed.values.foreach { rows =>
      val inOrder = rows.sortBy(_._1)
      // reconstruct the running offset: each doc starts where the previous ended
      var cum = 0L
      inOrder.foreach { case (_, _, seqId, seqOffset, n) =>
        assert(seqId == cum / 64 && seqOffset == cum % 64)
        cum += n
      }
    }
  }
}
