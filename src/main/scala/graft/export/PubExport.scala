package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Publication exports (SURVEY.md §0's dictyBase pub surface):
  *
  *  - dictypub (lib/Modware/Export/Command/dictypub.pm:63-113): the
  *    gene↔publication link TSV — feature_pub joined to non-deleted
  *    genes and PUBMED-place pubs, PUB-prefixed internal ids rejected,
  *    gene accession translated to its DDB id via a broadcast map;
  *  - pub2bib / chadopub2bib (lib/Modware/Transform/Command/pub2bib.pm,
  *    Export/Command/chadopub2bib.pm): the PubMed-XML fetch + XSLT is
  *    driver-side HTTP (SURVEY.md S11, out of engine scope) — the
  *    engine part is formatting pub rows as BibTeX records.
  */
object PubExport {

  /** Column contracts: `featurePub` (gene_id, pub_id); `genes`
    * (gene_id, name, is_deleted 0/1); `pubs` (pub_id, uniquename,
    * pubplace); `ddbMap` (gene_id, ddb_id). Output: ordered
    * `pubmed \t gene_name \t ddb_id` lines; rows that fail the DDB
    * translation are dropped (the reference warns + skips). */
  def genePubLinks(featurePub: DataFrame, genes: DataFrame, pubs: DataFrame,
                   ddbMap: DataFrame): DataFrame =
    featurePub
      .join(pubs.filter(col("pubplace") === "PUBMED" &&
        !col("uniquename").startsWith("PUB")), Seq("pub_id"))
      .join(genes.filter(col("is_deleted") === 0), Seq("gene_id"))
      .join(broadcast(ddbMap), Seq("gene_id"))
      .select(concat_ws("\t", col("uniquename"), col("name"), col("ddb_id"))
        .as("value"), col("uniquename"), col("ddb_id"))
      .orderBy(col("uniquename"), col("ddb_id"))
      .select(col("value"))

  /** dictypubannotation (lib/Modware/Export/Command/
    * dictypubannotation.pm:16-41): per-(gene, pub) annotation rows with
    * their curation props pivoted on — the reference walks feature_pub
    * with prefetched pubprops; here one join + a pipe-fold per link.
    * `featurePub`: (accession, pubmed); `pubprops`:
    * (accession, pubmed, prop). Output: ordered accession\tpubmed\tprops
    * lines. */
  def pubAnnotations(featurePub: DataFrame, pubprops: DataFrame): DataFrame = {
    val folded = pubprops.groupBy(col("accession"), col("pubmed"))
      .agg(concat_ws("|", sort_array(collect_list(col("prop")))).as("props"))
    featurePub
      .join(folded, Seq("accession", "pubmed"), "left_outer")
      .select(concat_ws("\t", col("accession"), col("pubmed"),
        coalesce(col("props"), lit(""))).as("value"),
        col("accession"), col("pubmed"))
      .orderBy(col("accession"), col("pubmed"))
      .select(col("value"))
  }

  /** BibTeX records from pub rows: (uniquename, title, authors
    * pipe-joined "Last, F.", journal, year, volume, pages). Multi-line
    * records carried as one `value` per pub, ordered by id. */
  def bibRecords(pubs: DataFrame): DataFrame =
    bibRecordsKeyed(pubs).orderBy(col("uniquename")).select(col("value"))

  /** [[bibRecords]] with the key columns retained — the
    * dictynonpub2bib per-source dump keeps `pubplace` alongside so the
    * write can partition one directory per source
    * (lib/Modware/Export/Command/dictynonpub2bib.pm:47-56, one output
    * file per pubplace there). */
  def bibRecordsKeyed(pubs: DataFrame): DataFrame =
    pubs.select(concat(
      lit("@article{PMID:"), col("uniquename"), lit(",\n"),
      lit("  author = {"),
      concat_ws(" and ", split(coalesce(col("authors"), lit("")), "\\|")),
      lit("},\n"),
      lit("  title = {"), coalesce(col("title"), lit("")), lit("},\n"),
      lit("  journal = {"), coalesce(col("journal"), lit("")), lit("},\n"),
      lit("  year = {"), coalesce(col("year"), lit("")), lit("},\n"),
      lit("  volume = {"), coalesce(col("volume"), lit("")), lit("},\n"),
      lit("  pages = {"), coalesce(col("pages"), lit("")), lit("}\n}")
    ).as("value"), col("uniquename"),
      (if (pubs.columns.contains("pubplace")) col("pubplace")
       else lit("PUBMED").as("pubplace")))
}
