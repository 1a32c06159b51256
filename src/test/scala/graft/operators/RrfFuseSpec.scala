package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RrfFuseSpec extends SparkSuite {
  import spark.implicits._

  test("overlapping docs sum both reciprocal ranks; singles keep one") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val out = InvertedIndex.rrfFuse(a, b, k = 60)
      .select(col("id"), col("rrf"), col("fused_rank"))
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(math.abs(byId(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(byId(1L) - 1.0 / 61) < 1e-15)
    assert(math.abs(byId(4L) - 1.0 / 62) < 1e-15)
    // doc 2 appears in both lists → must lead the fused order
    assert(out.head._1 == 2L)
    assert(out.map(_._3).toSeq == Seq(1, 2, 3, 4))
  }

  test("equal scores tie-break on id deterministically") {
    // 1 only in list a at rank 5, 2 only in list b at rank 5 → equal rrf
    val a = Seq((1L, 5)).toDF("id", "rank")
    val b = Seq((2L, 5)).toDF("id", "rank")
    val out = InvertedIndex.rrfFuse(a, b)
      .select(col("id"), col("fused_rank")).as[(Long, Int)]
      .collect().sortBy(_._2)
    assert(out.toSeq == Seq((1L, 1), (2L, 2)))
  }
}
