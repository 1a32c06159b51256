package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalClusterSpec extends SparkSuite {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("id_a", "id_b")

  private def assignment(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("cluster")).as[(Long, Long)].collect().toSet

  test("a bridging edge rewrites exactly the absorbed cluster's members") {
    // clusters {1,2,3} (label 1) and {10,11,12} (label 10); new edge 3-10
    val prev = Cluster.connectedComponents(edges((1, 2), (2, 3), (10, 11), (11, 12)))
    val updates = Cluster.incrementalComponents(prev, edges((3, 10)))
    // only the absorbed cluster's members move — label-1 members and any
    // unrelated cluster are never touched
    assert(assignment(updates) == Set((10L, 1L), (11L, 1L), (12L, 1L)))
  }

  test("an edge inside one existing cluster yields zero update rows") {
    val prev = Cluster.connectedComponents(edges((1, 2), (2, 3)))
    val updates = Cluster.incrementalComponents(prev, edges((1, 3)))
    assert(updates.count() == 0)
  }

  test("first-seen nodes are assigned; a new node can absorb an old cluster") {
    val prev = Cluster.connectedComponents(edges((10, 11)))
    // 100-101 is a brand-new pair; 5 is a new node with id BELOW the
    // existing cluster's min, so the old cluster re-labels to 5
    val updates = Cluster.incrementalComponents(prev, edges((100, 101), (5, 10)))
    assert(assignment(updates) ==
      Set((100L, 100L), (101L, 100L), (5L, 5L), (10L, 5L), (11L, 5L)))
  }

  test("chained merges across several prior clusters settle to the global min") {
    val prev = Cluster.connectedComponents(
      edges((1, 2), (10, 11), (20, 21), (30, 31)))
    // delta chains all four clusters together through their members
    val updates = Cluster.incrementalComponents(
      prev, edges((2, 10), (11, 20), (21, 30)))
    val merged = Cluster.applyComponentUpdates(prev, updates)
    assert(assignment(merged).map(_._2) == Set(1L))
    assert(assignment(merged) ==
      Set(1L, 2L, 10L, 11L, 20L, 21L, 30L, 31L).map(_ -> 1L))
  }

  test("incremental result equals from-scratch CC on a random md5 graph") {
    // 300 nodes, deterministic edges; ~60% of edges are "old"
    val all = (0 until 260).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"icc$i".getBytes("UTF-8"))
      val a = ((h(0) & 0xff) * 256 + (h(1) & 0xff)) % 300
      val b = ((h(2) & 0xff) * 256 + (h(3) & 0xff)) % 300
      (a.toLong, b.toLong, (h(4) & 0xff) < 153)
    }.filter(t => t._1 != t._2)
    val oldE = edges(all.filter(_._3).map(t => (t._1, t._2)): _*)
    val newE = edges(all.filterNot(_._3).map(t => (t._1, t._2)): _*)
    val prev = Cluster.connectedComponents(oldE)
    val merged = Cluster.applyComponentUpdates(
      prev, Cluster.incrementalComponents(prev, newE))
    val scratch = Cluster.connectedComponents(
      oldE.unionByName(newE))
    assert(assignment(merged) == assignment(scratch))
  }
}
