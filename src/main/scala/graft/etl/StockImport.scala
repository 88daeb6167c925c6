package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stock-center TSV importers (SURVEY.md S8 + J11): strain (4 col),
  * plasmid (3 col) and property (3 col) files with regex-validated ids,
  * then the strain→parent and strain→plasmid self-join stitching of
  * lib/Modware/Import/Stock/StrainImporter.pm:515-656 done set-based.
  */
object StockImport {

  val strainIdPattern = "^DBS[0-9]{7}$"
  val plasmidIdPattern = "^DBP[0-9]{7}$"

  private def tsv(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.option("sep", "\t").csv(path).toDF(cols: _*)

  /** strain.tsv: id, descriptor, species, parent_id (optional). Invalid
    * ids are dropped like the reference's regex gate
    * (StrainImporter.pm:35-89). */
  def strains(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Seq("stock_id", "descriptor", "species", "parent_id"))
      .filter(col("stock_id").rlike(strainIdPattern))

  /** plasmid.tsv: id, name, description. */
  def plasmids(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Seq("stock_id", "name", "description"))
      .filter(col("stock_id").rlike(plasmidIdPattern))

  /** props.tsv: id, prop_name, value — attached to either stock kind. */
  def props(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Seq("stock_id", "prop_name", "value"))
      .filter(col("stock_id").rlike("^DB[SP][0-9]{7}$"))

  /** J11: resolve parent links via self-join; unresolvable parents
    * surface with a null parent_descriptor (kept, like the reference's
    * lenient stitching). */
  def withParents(strains: DataFrame): DataFrame = {
    val parents = strains.select(
      col("stock_id").as("parent_id"),
      col("descriptor").as("parent_descriptor"))
    strains.join(parents, Seq("parent_id"), "left_outer")
  }

  /** organism2chado (lib/Modware/Import/Command/organism2chado.pm): the
    * reference fetches a taxon subtree from a SPARQL endpoint (HTTP —
    * driver-side per SURVEY.md S11) and bulk-populates `organism`; the
    * engine part is this TSV → dedup-vs-live → insert merge.
    * organisms.tsv: genus, species, common_name. Abbreviation derives
    * `G.species` like the reference's plugin. */
  def organisms(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Seq("genus", "species", "common_name"))
      .filter(col("genus").isNotNull && col("species").isNotNull)
      .withColumn("abbreviation",
        concat(substring(col("genus"), 1, 1), lit("."), col("species")))
      .dropDuplicates("genus", "species")

  /** J1-style organism upsert: only (genus, species) pairs absent from
    * the live table insert; returns (updated live, inserted count). */
  def mergeOrganisms(staging: DataFrame, live: DataFrame): (DataFrame, Long) = {
    val novel = staging.join(live.select(col("genus"), col("species")),
      Seq("genus", "species"), "left_anti").localCheckpoint()
    (live.unionByName(novel), novel.count())
  }

  /** Strain→plasmid links from a props frame (prop_name = 'plasmid'). */
  def plasmidLinks(strains: DataFrame, props: DataFrame,
                   plasmids: DataFrame): DataFrame =
    props.filter(col("prop_name") === "plasmid")
      .select(col("stock_id"), col("value").as("plasmid_id"))
      .join(strains.select(col("stock_id")), Seq("stock_id"), "left_semi")
      .join(plasmids.select(col("stock_id").as("plasmid_id"), col("name")),
        Seq("plasmid_id"), "left_outer")
}
