package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML table census — the structure half of table-to-text curation:
  * before a pipeline linearizes tables for training (or drops pages
  * that are MOSTLY table chrome), it needs per-document structure
  * counts: how many tables, their row/cell volume, header discipline,
  * and how much actual text sits in cells. The boilerplate-ratio
  * triage (q188) sees tables only as markup mass; this walk sees their
  * shape.
  *
  * Extraction is regex-relational over non-nested `<table>` blocks —
  * the same tolerant subset treatment as [[Sitemap]]/[[Feeds]] (a
  * nested table's inner rows count toward the outer block's census in
  * this subset; the fixtures that gate it are non-nested). Cell text
  * is tag-stripped before counting so inline markup (`<b>`, `<a>`)
  * doesn't inflate the text volume. Two explodes (tables, then rows)
  * with the per-row cell work done by higher-order array functions —
  * no third explode, no shuffle beyond the final per-doc aggregation.
  */
object HtmlTables {

  private val TableBlock = "(?si)<table[^>]*>(.*?)</table>"
  private val RowBlock = "(?si)<tr[^>]*>(.*?)</tr>"
  private val CellBlock = "(?si)<t[dh][^>]*>(.*?)</t[dh]>"
  private val HeaderCell = "(?si)<th[^>]*>(.*?)</th>"

  /** (doc_id, html) -> per-doc
    * (doc_id, n_tables, n_rows, n_cells, n_header_cells, max_row_cells,
    * cell_chars). Docs with no tables report zeros. */
  def census(docs: DataFrame): DataFrame = {
    val tables = docs.select(col("doc_id"),
      posexplode_outer(
        regexp_extract_all(col("html"), lit(TableBlock), lit(1)))
        .as(Seq("ti", "tbl")))
    val rows = tables.select(col("doc_id"), col("ti"), col("tbl"),
      posexplode_outer(
        regexp_extract_all(coalesce(col("tbl"), lit("")), lit(RowBlock), lit(1)))
        .as(Seq("ri", "row")))
    val perRow = rows.select(col("doc_id"), col("ti"), col("ri"),
      col("tbl").isNotNull.as("has_table"),
      when(col("row").isNotNull,
        regexp_extract_all(col("row"), lit(CellBlock), lit(1))).as("cells"),
      when(col("row").isNotNull,
        size(regexp_extract_all(col("row"), lit(HeaderCell), lit(1))))
        .otherwise(lit(0)).as("th_cnt"))
      .select(col("doc_id"), col("ti"), col("ri"), col("has_table"),
        coalesce(size(col("cells")), lit(0)).as("row_cells"),
        col("th_cnt"),
        coalesce(aggregate(col("cells"), lit(0L),
          (acc, c) => acc + length(regexp_replace(c, "<[^>]*>", ""))), lit(0L))
          .as("row_chars"))
    perRow.groupBy("doc_id")
      .agg(
        // a <table> with zero <tr> still counts as a table (its
        // posexplode_outer row carries ti with a null ri)
        countDistinct(when(col("has_table"), col("ti")))
          .cast("int").as("n_tables"),
        sum(when(col("ri").isNotNull, 1).otherwise(0)).cast("long").as("n_rows"),
        sum(col("row_cells")).cast("long").as("n_cells"),
        sum(col("th_cnt")).cast("long").as("n_header_cells"),
        max(col("row_cells")).cast("int").as("max_row_cells"),
        sum(col("row_chars")).cast("long").as("cell_chars"))
      .select(col("doc_id"), col("n_tables"), col("n_rows"), col("n_cells"),
        col("n_header_cells"), col("max_row_cells"), col("cell_chars"))
  }
}
