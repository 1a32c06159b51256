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

  test("forward direction and tolerance: next-at-or-after semantics, far matches nulled") {
    import spark.implicits._
    val left = Seq(
      (101L, 1L, 50L), (102L, 1L, 10L),
      (201L, 2L, 30L),
      (301L, 3L, 5L)).toDF("event_id", "k", "t")
    val right = Seq(
      (11L, 1L, 20L, Some(1.5)), (12L, 1L, 45L, Some(2.5)), (13L, 1L, 20L, Some(3.5)),
      (21L, 2L, 30L, Some(9.0)),
      (31L, 3L, 2L, Some(4.0))).toDF("rid", "k", "t", "v")

    val fwd = AsOfJoin.asof(left, right, "k", "t", "v", "rid", direction = "forward")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(fwd(101L) == None)      // nothing at or after t=50
    assert(fwd(102L) == Some(1.5)) // two rights at t=20: LOWEST seq wins forward
    assert(fwd(201L) == Some(9.0)) // equal ts visible forward too
    assert(fwd(301L) == None)      // right row exists only before

    // tolerance: the match is chosen first, then distance-gated (pandas
    // semantics) — not "nearest within bound"
    val tol = AsOfJoin.asof(left, right, "k", "t", "v", "rid",
        direction = "forward", tolerance = Some(10L))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(tol(102L) == Some(1.5)) // distance 10 == bound: inclusive
    val bwdTol = AsOfJoin.asof(left, right, "k", "t", "v", "rid",
        tolerance = Some(4L))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(bwdTol(101L) == None)   // prior row at distance 5 > 4 → nulled
    assert(bwdTol(201L) == Some(9.0))
  }

  test("nearest direction picks the closer side, exact ties resolve backward") {
    import spark.implicits._
    val left = Seq(
      (101L, 1L, 30L),  // backward at 20 (d=10), forward at 45 (d=15) → backward
      (102L, 1L, 43L),  // backward at 20 (d=23), forward at 45 (d=2)  → forward
      (201L, 2L, 25L),  // backward at 20 (d=5), forward at 30 (d=5)   → tie → backward
      (301L, 3L, 5L))   // forward only
      .toDF("event_id", "k", "t")
    val right = Seq(
      (11L, 1L, 20L, 1.5), (12L, 1L, 45L, 2.5),
      (21L, 2L, 20L, 3.0), (22L, 2L, 30L, 4.0),
      (31L, 3L, 9L, 5.0)).toDF("rid", "k", "t", "v")
    val out = AsOfJoin.asof(left, right, "k", "t", "v", "rid", direction = "nearest")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(101L) == Some(1.5))
    assert(out(102L) == Some(2.5))
    assert(out(201L) == Some(3.0))
    assert(out(301L) == Some(5.0))
  }

  test("property: forward/nearest equal their naive formulations on random histories") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.DataFrame

    val genRows = for {
      nL <- Gen.choose(1, 30)
      nR <- Gen.choose(0, 30)
      lefts <- Gen.listOfN(nL, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 25L)))
      rights <- Gen.listOfN(nR, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 25L),
        Gen.option(Gen.choose(0.0, 9.0))))
      tol <- Gen.option(Gen.choose(0L, 12L))
    } yield (lefts, rights, tol)

    def naive(left: DataFrame, right: DataFrame, forward: Boolean,
        tol: Option[Long]): Map[Long, Option[Double]] = {
      val r2 = right.toDF("rid", "k2", "rt", "v")
      val cond = if (forward) col("rt") >= col("t") else col("rt") <= col("t")
      val ord = if (forward) Seq(col("rt").asc_nulls_last, col("rid").asc_nulls_last)
        else Seq(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
      val dist = if (forward) col("rt") - col("t") else col("t") - col("rt")
      val best = left.join(r2, col("k") === col("k2") && cond, "left")
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_id").orderBy(ord: _*)))
        .filter(col("rn") === 1)
      val gated = tol.map(b => best.withColumn("v",
          when(col("rt").isNotNull && dist <= lit(b), col("v")))
          .withColumn("rt", when(dist <= lit(b), col("rt"))))
        .getOrElse(best)
      gated.select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    }

    val prop = Prop.forAll(genRows) { case (lefts, rights, tol) =>
      val left = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = rights.zipWithIndex.map { case ((k, t, v), i) => (1000L + i, k, t, v) }
        .toDF("rid", "k", "t", "v")
      val fwd = AsOfJoin.asof(left, right, "k", "t", "v", "rid", "forward", tol)
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      val fwdOk = fwd == naive(left, right, forward = true, tol)

      // nearest ≡ combine the two naive sides with the backward-tie cascade;
      // needs the matched ts, so rebuild with the distances exposed
      val r2 = right.toDF("rid", "k2", "rt", "v")
      def side(forward: Boolean): DataFrame = {
        val cond = if (forward) col("rt") >= col("t") else col("rt") <= col("t")
        val ord = if (forward) Seq(col("rt").asc_nulls_last, col("rid").asc_nulls_last)
          else Seq(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
        val dist = if (forward) col("rt") - col("t") else col("t") - col("rt")
        val best = left.join(r2, col("k") === col("k2") && cond, "left")
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_id").orderBy(ord: _*)))
          .filter(col("rn") === 1)
        val g = tol.map(b => best.filter(col("rt").isNotNull && dist <= lit(b)))
          .getOrElse(best.filter(col("rt").isNotNull))
        g.select(col("event_id"), col("v"), dist.as("d"))
      }
      val b = side(forward = false).select(col("event_id"), col("v").as("bv"), col("d").as("bd"))
      val f = side(forward = true).select(col("event_id"), col("v").as("fv"), col("d").as("fd"))
      val naiveNearest = left.select("event_id").join(b, Seq("event_id"), "left")
        .join(f, Seq("event_id"), "left")
        .select(col("event_id"),
          when(col("bd").isNull, col("fv"))
            .when(col("fd").isNull, col("bv"))
            .when(col("bd") <= col("fd"), col("bv"))
            .otherwise(col("fv")).as("v"))
        .as[(Long, Option[Double])].collect().toMap
      val near = AsOfJoin.asof(left, right, "k", "t", "v", "rid", "nearest", tol)
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      fwdOk && near == naiveNearest
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
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

  test("NTZ ts: tolerance math is session-time-zone independent across DST") {
    import spark.implicits._
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // America/New_York springs forward 2025-03-09 (wall 02:00 -> 03:00),
      // so the wall-clock span 01:30 -> 03:30 covers only 1h of epoch time
      // there. A session-TZ cast would measure 1h and wrongly pass the
      // 1.5h tolerance; NTZ distances must use the 2h wall-clock span.
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val left = Seq((1L, 1L, "2025-03-09 03:30:00")).toDF("event_id", "k", "s")
        .withColumn("t", col("s").cast("timestamp_ntz")).drop("s")
      val right = Seq((11L, 1L, "2025-03-09 01:30:00", 7.0)).toDF("rid", "k", "s", "v")
        .withColumn("t", col("s").cast("timestamp_ntz")).drop("s")
      val tol = 5400L * 1000000L // 1.5h in micros

      def run() = AsOfJoin
        .asof(left, right, "k", "t", "v", "rid", tolerance = Some(tol))
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      val ny = run()
      assert(ny(1L).isEmpty) // 2h wall distance > 1.5h tolerance

      spark.conf.set("spark.sql.session.timeZone", "UTC")
      assert(run() == ny) // same answer in any session zone
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
