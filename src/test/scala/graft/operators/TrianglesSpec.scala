package graft.operators

import graft.SparkSuite

class TrianglesSpec extends SparkSuite {

  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Triangles.perVertex(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("K4: every vertex in 3 triangles, clustering 1.0") {
    val k4 = for {
      i <- 0L to 3L; j <- 0L to 3L if i < j
    } yield (i, j)
    val c = census(k4)
    assert(c.size == 4)
    assert(c.values.forall { case (d, t, cl) => d == 3 && t == 3 && cl == 1.0 })
  }

  test("triangle with a pendant: counts and coefficients") {
    // 0-1-2 triangle, 3 hangs off 0
    val c = census(Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L)))
    assert(c(0L) == ((3L, 1L, 0.333333))) // round(2*1/(3*2), 6)
    assert(c(1L) == ((2L, 1L, 1.0)))
    assert(c(2L) == ((2L, 1L, 1.0)))
    assert(c(3L) == ((1L, 0L, 0.0)))
  }

  test("duplicates, self-loops, and direction are normalized away") {
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L), (1L, 2L), (2L, 0L))
    val c = census(messy)
    assert(c.values.map(_._2).sum == 3) // one triangle, seen at 3 vertices
  }

  test("triangle-free graph: zero everywhere, star pivot uncounted") {
    // star: hub 0 with 5 leaves — the hot-vertex shape the degree
    // orientation defuses (hub generates no wedges)
    val star = (1L to 5L).map(l => (0L, l))
    val c = census(star)
    assert(c.values.forall(_._2 == 0L))
    assert(c(0L)._1 == 5 && c(0L)._3 == 0.0)
  }

  test("two triangles sharing an edge") {
    // 0-1-2 and 1-2-3: shared edge (1,2)
    val c = census(Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L), (2L, 3L)))
    assert(c(1L)._2 == 2 && c(2L)._2 == 2)
    assert(c(0L)._2 == 1 && c(3L)._2 == 1)
    // deg(1)=3, two triangles among its 3 neighbor pairs
    assert(c(1L)._3 == math.rint(2.0 * 2 / (3 * 2) * 1e6) / 1e6)
  }
}
