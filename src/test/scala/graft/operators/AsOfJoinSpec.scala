package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {

  test("asof matches the naive per-row latest-prior lookup, incl. ties and null payloads") {
    import spark.implicits._
    // key 1: normal history; key 2: right row exactly at left ts (visible);
    // key 3: no prior right row; key 4: latest prior payload is NULL
    val left = Seq(
      (101L, 1L, 50L), (102L, 1L, 10L),
      (201L, 2L, 30L),
      (301L, 3L, 5L),
      (401L, 4L, 40L)).toDF("event_id", "k", "t")
    val right = Seq(
      (11L, 1L, 20L, Some(1.5)), (12L, 1L, 45L, Some(2.5)), (13L, 1L, 45L, Some(3.5)),
      (21L, 2L, 30L, Some(9.0)),
      (31L, 3L, 7L, Some(4.0)),
      (41L, 4L, 35L, None)).toDF("rid", "k", "t", "v")

    val out = AsOfJoin.asof(left, right, key = "k", ts = "t", payload = "v", seq = "rid")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap

    assert(out(101L) == Some(3.5)) // two right rows at t=45: highest seq wins
    assert(out(102L) == None)      // nothing at or before t=10
    assert(out(201L) == Some(9.0)) // equal ts is visible
    assert(out(301L) == None)
    assert(out(401L) == None)      // matched row exists but payload is NULL

    // cross-check against the naive (quadratic) formulation on the same data
    val r2 = right.toDF("rid", "k2", "rt", "v")
    val naiveBest = left
      .join(r2, col("k") === col("k2") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out == naiveBest)
  }

  test("property: asof equals the naive formulation on random histories") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val genRows = for {
      nL <- Gen.choose(1, 40)
      nR <- Gen.choose(0, 40)
      lefts <- Gen.listOfN(nL, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 30L)))
      rights <- Gen.listOfN(nR, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 30L),
        Gen.option(Gen.choose(0.0, 9.0))))
    } yield (lefts, rights)

    val prop = Prop.forAll(genRows) { case (lefts, rights) =>
      val left = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = rights.zipWithIndex.map { case ((k, t, v), i) => (1000L + i, k, t, v) }
        .toDF("rid", "k", "t", "v")
      val out = AsOfJoin.asof(left, right, "k", "t", "v", "rid")
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      val r2 = right.toDF("rid", "k2", "rt", "v")
      val naive = left
        .join(r2, col("k") === col("k2") && col("rt") <= col("t"), "left")
        .withColumn("rn", row_number().over(Window.partitionBy("event_id")
          .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)))
        .filter(col("rn") === 1)
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      out == naive
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
