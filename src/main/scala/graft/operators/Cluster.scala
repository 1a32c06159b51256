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
    *
    * Round structure: self-loops are folded into the adjacency, so
    * `min over neighbors-with-self` IS `least(own label, neighbor min)` —
    * one join + one aggregate per round instead of join/agg/join. The
    * adjacency is pre-partitioned by the join key once (the checkpoint
    * preserves its partitioning), so each round only shuffles the label
    * side + the aggregate. Convergence needs no comparison join either:
    * labels only ever decrease, so the label sum is stationary exactly at
    * the fixed point — a single-stage aggregate on the fresh checkpoint
    * (DECIMAL accumulation: a 100 TB corpus's id sum overflows i64).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // Symmetrize in ONE pass over the edge input: a union of two swapped
    // projections carries the (possibly expensive) upstream pair pipeline
    // in BOTH branches and evaluates it twice — for the q59 LSH-verified
    // pairs that doubled the whole query. Then checkpoint FIRST:
    // nodes/adj/labels all derive from sym, and without the cut each
    // would re-run the upstream pipeline again.
    val sym = edges
      .select(explode(array(
        struct(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst")),
        struct(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = sym.select(col("src")).distinct()
    val adj = sym.union(nodes.select(col("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)

    var labels = nodes.select(col("src").as("id"))
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    // no edges (clean corpus / empty delta): sum() is null — the correct
    // answer is the empty assignment table, not an NPE in compareTo
    if (prevSum == null) return labels

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = adj
        .join(labels.select(col("id").as("src"), col("cluster")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("cluster").as("cluster"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    // silently returning partial labels would mark several docs of one
    // component canonical — duplicates retained with no signal
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "a component's diameter exceeds maxIter; raise it")
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

  /** O(delta) maintenance of a converged component assignment when a
    * batch of NEW edges arrives — the streaming-dedup companion: the LSH
    * ingest (`streaming/StreamingDedup`) emits each micro-batch's
    * verified pairs, and re-running global CC over the accumulated pair
    * log every batch is exactly the O(history) re-pay the bucketed
    * cascade exists to avoid.
    *
    * Correctness rests on contraction: a converged component is fully
    * connected through its label, so CC(old ∪ delta) equals CC over the
    * CONTRACTED graph whose nodes are prior cluster ids (new nodes map
    * to themselves) and whose edges are the delta pairs mapped through
    * the prior assignment. That graph is O(delta) nodes/edges
    * regardless of history size; label propagation on it converges in
    * O(merged-chain diameter) rounds. Labels stay "min reachable id":
    * contracted nodes carry their component minima, and min-of-minima
    * is the global min.
    *
    * Returns ONLY the rows a keyed merge (`ReplaceInto`) must write:
    * members of prior clusters absorbed into a smaller-id component,
    * plus first-seen nodes. A delta edge INSIDE one existing cluster
    * contracts to a self-loop and yields zero update rows — untouched
    * components are provably never rewritten. Cost: one keyed join of
    * the delta endpoints against the assignment (semi-join sized by the
    * delta), CC on the contracted graph, and one join keyed by the
    * absorbed cluster ids — never a scan of unaffected assignment rows
    * beyond the key-pruned joins.
    *
    * `prevLabels`: (id, cluster), converged. `newEdges`: (id_a, id_b).
    */
  def incrementalComponents(prevLabels: DataFrame, newEdges: DataFrame)
      : DataFrame = {
    val ends = newEdges.select(col("id_a").cast("long").as("id"))
      .union(newEdges.select(col("id_b").cast("long").as("id")))
      .distinct()
    // node = prior cluster, or self for first-seen ids; keep the null
    // flag — a canonical member (cluster == id) must not be mistaken
    // for a new node
    val mapped = ends
      .join(prevLabels.select(col("id"), col("cluster").as("prev")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("prev"), col("id")).as("node"),
        col("prev").isNull.as("is_new"))
      .localCheckpoint(true)
    val contracted = newEdges
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .join(mapped.select(col("id").as("id_a"), col("node").as("na")),
        Seq("id_a"))
      .join(mapped.select(col("id").as("id_b"), col("node").as("nb")),
        Seq("id_b"))
      .select(col("na").as("id_a"), col("nb").as("id_b"))
    val superLabels = connectedComponents(contracted)
    // prior clusters absorbed into a smaller-id component → rewrite
    // their members; clusters that keep their label need no writes
    val absorbed = superLabels
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("cluster"), col("cluster").as("new_cluster"))
    val memberUpdates = prevLabels.join(absorbed, Seq("cluster"))
      .select(col("id"), col("new_cluster").as("cluster"))
    val newNodeUpdates = mapped.filter(col("is_new"))
      .join(superLabels.select(col("id").as("node"), col("cluster")),
        Seq("node"))
      .select(col("id"), col("cluster"))
    memberUpdates.union(newNodeUpdates)
  }

  /** Fold incremental updates into the prior assignment (last-wins keyed
    * merge — the in-plan twin of a `ReplaceInto` on the assignment
    * table). */
  def applyComponentUpdates(prevLabels: DataFrame, updates: DataFrame)
      : DataFrame =
    prevLabels.join(updates.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("cluster"))
      .union(updates.select(col("id"), col("cluster")))
}
