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
