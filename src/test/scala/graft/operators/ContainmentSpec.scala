package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSuite {
  import spark.implicits._

  test("a subset document scores containment 1 in its direction; Jaccard stays low") {
    // A = {s1..s3} wholly inside B = {s1..s12}
    val shingles = ((1 to 3).map(i => (1L, s"s$i")) ++
      (1 to 12).map(i => (2L, s"s$i"))).toDF("id", "shingle")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.containmentVerify(shingles, pairs)
      .as[(Long, Long, Double, Double, Double)].head()
    val (_, _, ca, cb, j) = out
    assert(ca == 1.0) // all of A's shingles are in B
    assert(cb == 0.25) // 3 of B's 12
    assert(j == 0.25) // 3 / 12 union
    // the symmetric rule (jaccard >= 0.5) misses this pair; the
    // directional rule (max containment >= 0.9) catches it
    assert(j < 0.5 && math.max(ca, cb) >= 0.9)
  }

  test("disjoint and partial overlaps score exactly") {
    val shingles = Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"),
      (3L, "x")).toDF("id", "shingle")
    val out = Dedup.containmentVerify(shingles,
        Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b"))
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((1L, 2L)) == ((0.5, 0.5, 0.333333))) // round(_, 6)
    // zero-overlap pairs produce no row (inner join on shared shingles)
    assert(!out.contains((1L, 3L)))
  }
}
