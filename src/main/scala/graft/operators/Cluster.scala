package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step that
  * turns q57-style verified pairs into per-document cluster assignments
  * (keep min-id doc per cluster, drop the rest), which is how a
  * training-data pipeline actually applies dedup.
  *
  * Algorithm: min-label propagation. Every node starts labeled with its
  * own id; each round a node takes the min of its label and its
  * neighbors' labels; converged when no label changes. Rounds =
  * O(component diameter) — near-dup clusters are dense and shallow
  * (diameter 2-3 in practice), so this settles in a handful of rounds.
  * Every round is one shuffle-by-key join + aggregate, no driver-side
  * graph: at 100 TB the edge list and labels stay distributed, and the
  * per-round `localCheckpoint` truncates the growing lineage so round N
  * doesn't replay rounds 1..N-1. (For adversarial long-chain graphs the
  * alternating large-star/small-star formulation halves rounds; dedup
  * graphs don't need it.)
  */
object Cluster {

  /** edges: (id_a, id_b) undirected pairs. Returns (id, cluster) for every
    * node in the edge list, cluster = min reachable node id.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(edges
        .select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min neighbor label per node
      val neighborMin = sym
        .join(labels.select(col("id").as("src"), col("cluster")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("cluster").as("nmin"))
      // carry prev alongside so convergence reads off the checkpointed
      // result — no extra join/shuffle per round just to detect change
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("__prev"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      converged = next.filter(col("cluster") =!= col("__prev")).limit(1).count() == 0
      labels = next.select("id", "cluster")
      iter += 1
    }
    labels
  }

  /** Dedup decision per document: its cluster and whether it is the kept
    * canonical representative (the cluster's min id). Documents absent
    * from the pair list are their own singleton clusters — callers union
    * them in from the corpus when materializing the keep-list.
    */
  def dedupAssignments(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("id"), col("cluster"),
        (col("id") === col("cluster")).as("is_canonical"))
}
