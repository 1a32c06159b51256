package graft.operators

import graft.SparkSuite

class ClusterSpec extends SparkSuite {

  test("connected components: chains, separate components, canonical flags") {
    import spark.implicits._
    // component {1,2,3,4} as a chain (diameter 3 — needs propagation
    // rounds), component {10,11}, pair order reversed on purpose
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (11L, 10L))
      .toDF("id_a", "id_b")
    val got = Cluster.dedupAssignments(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("connected components: long chain converges within iteration bound") {
    import spark.implicits._
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Cluster.connectedComponents(chain)
    assert(labels.collect().forall(_.getLong(1) == 1L))
  }
}
