package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSuite {

  test("zValue interleaves bits exactly (reference pairs)") {
    import spark.implicits._
    // (x, y, expected morton) — hand-computed: x bits at even positions
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),
      (0L, 1L, 2L),
      (1L, 1L, 3L),
      (5L, 3L, 27L), // x=101 -> 010001, y=011 -> 001010 => 011011 = 27
      (65535L, 0L, 0x55555555L),
      (0L, 65535L, 0xAAAAAAAAL),
      (65535L, 65535L, 0xFFFFFFFFL))
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("x", "y")
      .select(col("x"), col("y"),
        Zorder.zValue(Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == cases)
  }

  test("z-clustered layout prunes range predicates on BOTH dims") {
    import spark.implicits._
    // synthetic 2-d grid: 40k rows over a 200x200 key space
    val df = spark.range(40000).select(
      (col("id") % 200).as("x"), (col("id") / 200).as("y"))
    val nP = 32
    // partitions a file-skipper must open for a min/max-stats predicate
    def hits(envs: Array[org.apache.spark.sql.Row],
        lo: Long, hi: Long, dim: Int): Int =
      envs.count { r =>
        val (mn, mx) = (r.getLong(1 + 2 * dim), r.getLong(2 + 2 * dim))
        mx >= lo && mn <= hi
      }
    val zLayout = Zorder.clusterByZ(df, Seq(col("x"), col("y")), bits = 8, nP)
    val zEnvs = Zorder.partitionEnvelopes(zLayout, Seq(col("x"), col("y"))).collect()
    val xLayout = df.repartitionByRange(nP, col("x")).sortWithinPartitions("x")
    val xEnvs = Zorder.partitionEnvelopes(xLayout, Seq(col("x"), col("y"))).collect()
    // the single-column sort is perfect on its own column and USELESS on
    // the other: every x-range spans all of y
    assert(hits(xEnvs, 40, 60, dim = 0) <= 6)
    assert(hits(xEnvs, 40, 60, dim = 1) == nP)
    // z-order prunes materially on EITHER dimension — that's the point
    val (zx, zy) = (hits(zEnvs, 40, 60, dim = 0), hits(zEnvs, 40, 60, dim = 1))
    assert(zx <= nP / 2, s"z x-pruning weak: $zx of $nP")
    assert(zy <= nP / 2, s"z y-pruning weak: $zy of $nP")
    // both layouts hold the same rows
    assert(zLayout.count() == df.count())
  }

  test("dims*bits beyond 63 is rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Zorder.zValue(Seq(col("x"), col("y")), 32)
    }
  }
}
