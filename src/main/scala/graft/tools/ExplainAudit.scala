package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected catalog
  * queries and greps for the properties that matter at 100 TB — pushed
  * filters reaching the parquet scan, pruned read schemas, broadcast
  * joins on dimension/delta sides, whole-stage codegen coverage.
  *
  * Usage: runMain graft.tools.ExplainAudit [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_project_filter", "q05_join_inner_agg", "q09_join_broadcast_dims",
        "q11_agg_pricing_summary", "q43_flat_obs_stage",
        // round-2 scale paths: LSH band-key equi-join (never all-pairs),
        // the shared-collect stage agg, the (label, pos) partial-agg grain
        "q57_dedup_lsh_verified", "q55_flat_lab_obs_stage", "q63_label_centroids",
        // curation ops: broadcast eval semi-join, zero-shuffle sample,
        // one-shuffle sharded packing
        "q64_decontaminate", "q65_stratified_sample", "q66_sequence_pack",
        // round-5 scale paths: line-dedup agg+join-back (AQE-splittable,
        // not a window), gram-count keyed shuffles, the 1-row-broadcast
        // TF-IDF N join, the binary-ANN broadcast signature scan, and the
        // two-projection decode (lookups must NOT re-merge into the arms)
        "q98_dedup_lines", "q101_duplicated_spans", "q102_tfidf_keywords",
        "q99_ann_binary_rerank", "q73_visit_summary_typed",
        // round-8 scale paths: the dHash band equi-join, SemDeDup's
        // cell-bounded pair scan, the domain broadcast drop-list, the
        // chunk copy-count keyed shuffle, and BM25's TakeOrdered top-k
        // over term-keyed postings
        "q132_image_neardup_hamming", "q133_semantic_dedup",
        "q135_domain_quality_filter", "q141_cdc_chunk_dedup",
        "q142_bm25_topk")
    names.foreach { n =>
      val q = graft.SparkEntry.catalog.find(_.name == n).getOrElse(
        sys.error(s"unknown query $n"))
      val plan = q.run(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n===== $n =====")
      println(plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Scan parquet") || l.contains("BroadcastHashJoin") ||
          l.contains("SortMergeJoin") || l.contains("WholeStageCodegen") ||
          l.contains("Exchange") || l.contains("HashAggregate") ||
          l.contains("(") && l.length < 80 && l.trim.matches("^\\([0-9]+\\) .*"))
        .take(40).mkString("\n"))
    }
    spark.stop()
  }
}
