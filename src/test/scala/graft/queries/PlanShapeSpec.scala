package graft.queries

import graft.SparkSuite

/** Plan-shape regression gate: the scale properties ExplainAudit prints are
  * asserted here for EVERY catalog query, so a refactor that silently
  * degrades a plan (a new cartesian product, a lost filter pushdown, a
  * full-width scan under a narrow projection) fails the suite instead of
  * surfacing as a 100 TB incident.
  *
  * The physical plan is built (`executedPlan`) but not executed; fixture
  * scale is irrelevant to plan shape except where AQE would re-plan at
  * runtime — these assertions are on the static plan, which is the
  * conservative side (AQE only ever removes exchanges / converts to
  * broadcast, never introduces a nested loop).
  */
class PlanShapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** The only queries allowed to plan an all-pairs join, each for a stated
    * reason; this list is exact — every other catalog query (including the
    * minhash family, whose DuckDB oracles spell CROSS JOIN against a
    * literal seed list) plans pure equi-joins.
    */
  private val allPairsAllowed: Map[String, String] = Map(
    // labeled exact brute-force ANN baseline (SCALE.md); q41/q46 are its
    // bucketed scale-path twins and are NOT exempt from the equi-join rule
    "q40_ann_cosine_topk" -> "labeled brute-force baseline",
    // probe x broadcast centroid list: the nested loop's build side is the
    // k-row centroid table, bounded by construction
    "q46_ann_ivf" -> "broadcast of bounded centroid list",
    // same probe-vs-broadcast-centroids loop as q46; the PQ stages beyond
    // it (codebook train/encode/ADC) are pure equi-joins
    "q82_ann_ivfpq" -> "broadcast of bounded centroid list",
    "q85_ann_ivfpq_rerank" -> "broadcast of bounded centroid list",
    // per-source rates x broadcast 1-row global token total
    "q67_mixture_rates" -> "broadcast of a single-row global aggregate",
    // the 8-byte-signature Hamming scan: corpus x broadcast |Q| query
    // signatures — the scan being all-pairs over 8-byte rows is the
    // design point (64x cheaper per candidate than f32); the rerank
    // beyond it is broadcast equi-joins
    "q99_ann_binary_rerank" -> "broadcast of bounded query-signature list",
    // per-(doc,term) scores x broadcast 1-row corpus doc count
    "q102_tfidf_keywords" -> "broadcast of a single-row global aggregate",
    // same probe-vs-broadcast-centroids loop as q46/q82/q85; the Hamming
    // prefilter and rerank beyond it are equi-joins on cell / vec_id
    "q113_ann_ivf_binary_rerank" -> "broadcast of bounded centroid list",
    // SemDeDup's assignment pass is the same corpus-vs-broadcast-centroids
    // loop as q46; the within-cell pair scan beyond it is an equi-join on
    // cell with a pair repartition
    "q133_semantic_dedup" -> "broadcast of bounded centroid list",
    // per-(doc,term) BM25 weights x broadcast 1-row corpus stats (N, avgdl)
    "q142_bm25_topk" -> "broadcast of a single-row global aggregate",
    // kNN auto-labeling probes the same broadcast centroid list as q46
    "q150_knn_label_propagation" -> "broadcast of bounded centroid list",
    // 3 quantile targets x broadcast 256-bin cumulative histogram (the
    // rank inequality is a theta join over two bounded frames)
    "q151_histogram_quantile_sketch" -> "broadcast of bounded histogram/stats",
    // q142's one-row corpus-stats broadcast, via the maintained index
    "q156_bm25_incremental_index" -> "broadcast of a single-row global aggregate",
    // (vec, i, x) rows x broadcast dOut-row output-dim list — the dense
    // JL projection's fan-out; the matrix itself is md5-derived per cell
    "q163_jl_projection" -> "broadcast of bounded output-dim list",
    // corpus x broadcast single-row query vector (the q46 centroid
    // pattern with |Q| = 1); the RRF fusion beyond it is a bounded
    // top-N full-outer join
    "q164_hybrid_rrf_retrieval" -> "broadcast of a single-row query vector",
    // the coarse scan's corpus x broadcast bounded query list — the
    // q40/q99 shape with the per-pair cost cut by dIn/dOut (projection
    // itself is the row-local JlProjectExpr, no join)
    "q165_jl_search_rerank" -> "broadcast of bounded query list",
    // three single-row aggregates joined into one metrics row
    "q172_lsh_recall_eval" -> "broadcast of single-row aggregates",
    // per-source rows x broadcast 1-row (denom, total) aggregate
    "q173_temperature_mixture" -> "broadcast of a single-row global aggregate",
    // frequency buckets x broadcast 1-row (totals, global max) aggregate
    "q174_skew_diagnosis" -> "broadcast of a single-row global aggregate",
    // rollup rows x broadcast 1-row corpus token total
    "q178_dataset_card" -> "broadcast of a single-row global aggregate")

  private def planOf(name: String): String = {
    val q = graft.SparkEntry.catalog.find(_.name == name).get
    q.run(spark, dir).queryExecution.executedPlan.toString
  }

  test("no catalog query plans an unlabeled cartesian / nested-loop join") {
    val offenders = graft.SparkEntry.catalog.flatMap { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      val allPairs = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (allPairs && !allPairsAllowed.contains(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"unlabeled all-pairs join planned by: ${offenders.mkString(", ")}")
  }

  /** Queries allowed to broadcast a frame whose lineage reaches a
    * corpus-scale table WITHOUT a plan-visible cardinality bound (global
    * aggregate or limit) — each because a literal FILTER bounds the side
    * by construction. This list is exact: any new broadcast of a
    * corpus-derived frame (the q248 round-12 defect class — a side that
    * grows O(corpus) and OOMs the driver at 100×) must either carry a
    * plan-visible bound or be adjudicated here with its stated bound.
    */
  private val corpusBroadcastAllowed: Map[String, String] = Map.empty

  test("no catalog query broadcasts an unbounded corpus-derived frame") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val corpusTables =
      Seq("documents", "embeddings", "lineitem", "orders", "events")
    def unboundedCorpusBroadcasts(plan: SparkPlan): Seq[String] =
      plan.collect {
        case b: BroadcastExchangeExec =>
          val sub = b.child.toString
          val scanned = corpusTables.filter(t => sub.contains(s"$t.parquet"))
          // a 1-row global aggregate or a limit anywhere below the
          // exchange bounds the broadcast side regardless of corpus size
          val bounded = b.child.collect {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
                if a.groupingExpressions.isEmpty => a
            case l: org.apache.spark.sql.execution.GlobalLimitExec => l
            case l: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => l
            // a literal pushed filter on the scan (vec_id < 5 query
            // sets) is the bounded-query-set ANN pattern; it shows up
            // as a non-empty PushedFilters list with a comparison
          }.nonEmpty
          if (scanned.nonEmpty && !bounded) scanned else Nil
      }.flatten.distinct
    val offenders = graft.SparkEntry.catalog.flatMap { q =>
      if (corpusBroadcastAllowed.contains(q.name)) None
      else {
        val tables = unboundedCorpusBroadcasts(
          q.run(spark, dir).queryExecution.executedPlan)
        if (tables.nonEmpty) Some(s"${q.name} (${tables.mkString("/")})")
        else None
      }
    }
    assert(offenders.isEmpty,
      s"corpus-derived broadcast without a plan-visible bound: " +
        offenders.mkString(", "))
  }

  test("filter pushdown and column pruning reach the parquet scan") {
    val plan = planOf("q01_scan_project_filter")
    // the filter arrives at the scan as a data filter, not post-scan only
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(!plan.contains("PushedFilters: []"),
      "scan has an empty pushed-filter list — pushdown regressed")
    // the narrow projection must prune the 16-column lineitem schema; only
    // the ReadSchema struct itself is inspected (the scan line also lists
    // DataFilters/PushedFilters, whose commas are not columns)
    val read = plan.linesIterator.find(_.contains("ReadSchema"))
      .flatMap(l => "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(l))
      .map(_.group(1)).getOrElse("")
    assert(read.nonEmpty && read.count(_ == ',') < 6,
      s"scan reads unpruned schema: <$read>")
  }

  test("dimension joins broadcast the small side") {
    val plan = planOf("q09_join_broadcast_dims")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("the LSH verify path joins on band/pair keys only (equi-joins)") {
    val plan = planOf("q57_dedup_lsh_verified")
    assert(!plan.contains("CartesianProduct"),
      "LSH candidate generation degraded to a cartesian product")
  }
}
