package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.WikiText

/** chado2genesummary export (SURVEY.md J12 + F14): the reference joins a
  * Chado `featureprop` paragraph pointer to the legacy Oracle
  * `paragraph` table one row at a time
  * (lib/Modware/Export/Command/chado2genesummary.pm:92-123); here the
  * two stores — typically two JDBC sources — join set-based, and the
  * HTML payload converts to MediaWiki markup in one UDF projection.
  */
object GeneSummary {

  /** `geneProps`: (gene_id, paragraph_no); `paragraphs`:
    * (paragraph_no, html). Returns (gene_id, summary) — the 3-col TSV
    * shape minus the constant curator column. */
  def export(geneProps: DataFrame, paragraphs: DataFrame): DataFrame =
    geneProps
      .join(paragraphs, Seq("paragraph_no"))
      .select(col("gene_id"),
        WikiText.html_to_wiki(col("html")).as("summary"))

  /** Serialize as the reference's tab-separated gene summary rows. */
  def toTsvLines(summaries: DataFrame): DataFrame =
    summaries
      .orderBy(col("gene_id"))
      .select(concat_ws("\t", col("gene_id"), col("summary")).as("value"))
}
