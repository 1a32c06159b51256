package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {

  test("intervalJoin equals the naive range join across bucket widths") {
    import spark.implicits._
    // deterministic pseudo-random points and intervals spanning many
    // buckets, incl. multi-bucket-long, boundary-exact, and empty ones
    val points = (1 to 400)
      .map(i => (i.toLong, (i * 37 % 1000).toLong)).toDF("pid", "x")
    val intervals = ((1 to 60).map { i =>
      val lo = (i * 53 % 900).toLong
      (i.toLong, lo, lo + (i % 7) * 40L) // lengths 0..240 (0 = degenerate)
    } :+ ((99L, 100L, 100L))).toDF("iid", "lo", "hi")

    val naive = points.crossJoin(intervals)
      .filter(col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    for (width <- Seq(7L, 64L, 1000L, 5000L)) {
      val bucketed = RangeJoin.intervalJoin(points, "x", intervals, "lo", "hi", width)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(bucketed.length == bucketed.toSet.size, s"dup pairs at width $width")
      assert(bucketed.toSet == naive, s"mismatch at width $width")
    }
  }
}
