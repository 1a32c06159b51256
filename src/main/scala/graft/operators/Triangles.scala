package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle census over an undirected graph — the community /
  * spam-cluster signal beside PageRank (q153) and connected components
  * ([[Cluster]]): a link farm shows up as an anomalously clustered
  * neighborhood, and per-vertex clustering coefficients feed the same
  * domain-triage frame as the degree stats (q195).
  *
  * The scalable form is the degree-ordered orientation (the
  * MapReduce-era "curse of the last reducer" fix): orient every edge
  * from its lower-(degree, id) endpoint to the higher one, build wedges
  * only from each vertex's OUT-neighbors, and close them against the
  * oriented edge set. Every triangle is counted exactly once — at its
  * lowest-rank vertex — and the wedge fan-out per vertex is bounded by
  * its out-degree, which the orientation caps at O(√m)-ish (arboricity
  * bound) even when the raw degree is millions: the celebrity vertex
  * generates NO wedges because all its edges point toward it. Cost: one
  * self-join shuffle on the wedge pivot + one hash join for closure;
  * the per-vertex rollup is a map-side-combinable count.
  *
  * No orientation appears in the OUTPUT contract (a triangle census is
  * orientation-invariant), which is how the oracle replays it with the
  * simple a<b<c three-way join.
  */
object Triangles {

  /** (src, dst) rows, any direction, self-loops and duplicates
    * tolerated → per-vertex (vertex, degree, n_triangles, clustering).
    * `clustering` = 2·T(v) / (deg(v)·(deg(v)−1)), 6dp, 0.0 below
    * degree 2. */
  def perVertex(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

    val deg = canon.select(col("a").as("v"))
      .unionAll(canon.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))

    // orient each edge toward the higher (degree, id) rank
    val withDeg = canon
      .join(deg.select(col("v").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("degree").as("db")), Seq("b"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("u"),
      when(aLower, col("b")).otherwise(col("a")).as("x"),
      when(aLower, col("db")).otherwise(col("da")).as("dx"))

    // wedges: ordered out-neighbor pairs of u; the closing edge is
    // oriented x1 -> x2 because rank(x1) < rank(x2)
    val e1 = oriented.select(col("u"), col("x").as("x1"), col("dx").as("d1"))
    val e2 = oriented.select(col("u"), col("x").as("x2"), col("dx").as("d2"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("x1") < col("x2")))
    val closing = oriented.select(col("u").as("x1"), col("x").as("x2"))
    val tri = wedges.join(closing, Seq("x1", "x2"))
      .select(col("u"), col("x1"), col("x2"))

    val perV = tri
      .select(explode(array(col("u"), col("x1"), col("x2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))

    deg.join(perV, Seq("v"), "left")
      .select(col("v").as("vertex"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
