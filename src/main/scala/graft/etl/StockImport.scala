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

  /** Shared headerless-TSV reader (also used by the CLI's TSV-fed
    * export verbs — one implementation, not three). */
  private[graft] def tsv(spark: SparkSession, path: String,
                         cols: Seq[String]): DataFrame =
    spark.read.option("sep", "\t").csv(path).toDF(cols: _*)

  /** strain.tsv: id, descriptor, species, parent_id (optional). Invalid
    * ids are dropped like the reference's regex gate
    * (StrainImporter.pm:35-89). */
  def strains(spark: SparkSession, path: String): DataFrame =
    strainGate(tsv(spark, path,
      Seq("stock_id", "descriptor", "species", "parent_id")))

  /** The reference's strain-id regex gate over an already-loaded frame
    * — the entry point the oracle row (q111) uses; [[strains]] is
    * exactly `strainGate(tsv(path))`. */
  def strainGate(df: DataFrame): DataFrame =
    df.filter(col("stock_id").rlike(strainIdPattern))

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

  // ------------------------------------------------------------------
  // dictystrain2chado / dictyplasmid2chado store import
  // (lib/Modware/Import/Command/dictystrain2chado.pm,
  //  dictyplasmid2chado.pm + Stock/StrainImporter.pm /
  //  PlasmidImporter.pm): the reference walks each TSV line through ORM
  //  find-or-create; here each file is a frame and the store merge is
  //  one anti-join per table.

  /** Per-table staging for one stock kind. `stock` rows carry the kind
    * in `stype`; `relationship` holds parent (`is_parent_of`,
    * StrainImporter.pm:515-581) and strain→plasmid (`part_of`,
    * :583-655) edges; `pub` is the stock→publication link table. */
  case class StockStaging(stock: DataFrame, stockprop: DataFrame,
                          relationship: DataFrame, pub: DataFrame)

  /** Read `<dir>/<prefix><name>.tsv` or an empty frame with the given
    * columns — the reference's per-`data` file dispatch, where any
    * subset of the data files may be present. */
  private def optTsv(spark: SparkSession, dir: String, prefix: String,
                     name: String, cols: Seq[String]): DataFrame = {
    val p = s"$dir/$prefix$name.tsv"
    if (new java.io.File(p).exists()) tsv(spark, p, cols)
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(cols.map(StructField(_, StringType))))
    }
  }

  /** strain_*.tsv files → staging (StrainImporter.pm). Descriptions go
    * through the html→wiki chain like import_stock (F14,
    * StrainImporter.pm:69-72); invalid ids drop at the regex gate. */
  def strainStaging(spark: SparkSession, dataDir: String): StockStaging = {
    val pre = "strain_"
    val stock = optTsv(spark, dataDir, pre, "strain",
      Seq("stock_id", "name", "species", "description"))
      .filter(col("stock_id").rlike(strainIdPattern))
      .withColumn("description",
        graft.functions.WikiText.html_to_wiki(col("description")))
      .withColumn("stype", lit("strain"))
    val props = optTsv(spark, dataDir, pre, "props",
      Seq("stock_id", "prop_name", "value"))
      .filter(col("stock_id").rlike(strainIdPattern))
    val parent = optTsv(spark, dataDir, pre, "parent",
      Seq("stock_id", "parent_id"))
      .filter(col("stock_id").rlike(strainIdPattern))
      .select(col("stock_id").as("object_id"),
        col("parent_id").as("subject_id"), lit("is_parent_of").as("reltype"))
    val plasmid = optTsv(spark, dataDir, pre, "plasmid",
      Seq("stock_id", "plasmid_id"))
      .filter(col("stock_id").rlike(strainIdPattern))
      .select(col("stock_id").as("object_id"),
        col("plasmid_id").as("subject_id"), lit("part_of").as("reltype"))
    val pub = optTsv(spark, dataDir, pre, "publications",
      Seq("stock_id", "pub_id"))
      .filter(col("stock_id").rlike(strainIdPattern))
    StockStaging(stock, props, parent.unionByName(plasmid), pub)
  }

  /** plasmid_*.tsv files → staging (PlasmidImporter.pm). */
  def plasmidStaging(spark: SparkSession, dataDir: String): StockStaging = {
    val pre = "plasmid_"
    val stock = optTsv(spark, dataDir, pre, "plasmid",
      Seq("stock_id", "name", "description"))
      .filter(col("stock_id").rlike(plasmidIdPattern))
      .withColumn("species", lit(null).cast("string"))
      .withColumn("stype", lit("plasmid"))
      .select(col("stock_id"), col("name"), col("species"),
        col("description"), col("stype"))
    val props = optTsv(spark, dataDir, pre, "props",
      Seq("stock_id", "prop_name", "value"))
      .filter(col("stock_id").rlike(plasmidIdPattern))
    val pub = optTsv(spark, dataDir, pre, "publications",
      Seq("stock_id", "pub_id"))
      .filter(col("stock_id").rlike(plasmidIdPattern))
    StockStaging(stock, props,
      stock.limit(0).select(col("stock_id").as("object_id"),
        col("stock_id").as("subject_id"), col("stock_id").as("reltype")),
      pub)
  }

  /** Merge a staging set into the parquet stock store with per-table
    * insert counts. Relationship edges resolve BOTH ends against the
    * post-insert stock table, dropping unresolvable links like the
    * reference's find_stock misses (StrainImporter.pm:544-556, warn +
    * skip) — the dropped count surfaces as `relationship_skipped`. The
    * anti-join novelty per table makes a re-import a no-op. */
  def mergeIntoStore(spark: SparkSession, st: StockStaging,
                     store: String): Map[String, Long] = {
    import graft.sinks.ParquetUpsert
    val nStock = ParquetUpsert(spark, st.stock, s"$store/stock", Seq("stock_id"))
    val nProp = ParquetUpsert(spark, st.stockprop, s"$store/stockprop",
      Seq("stock_id", "prop_name", "value"))
    val loaded = spark.read.parquet(s"$store/stock").select(col("stock_id"))
    val resolvable = st.relationship
      .join(loaded.select(col("stock_id").as("object_id")), Seq("object_id"), "left_semi")
      .join(loaded.select(col("stock_id").as("subject_id")), Seq("subject_id"), "left_semi")
      .localCheckpoint()
    val nSkipped = st.relationship.count() - resolvable.count()
    val nRel = ParquetUpsert(spark, resolvable, s"$store/stock_relationship",
      Seq("object_id", "subject_id", "reltype"))
    val nPub = ParquetUpsert(spark, st.pub, s"$store/stock_pub",
      Seq("stock_id", "pub_id"))
    Map("stock" -> nStock, "stockprop" -> nProp,
      "stock_relationship" -> nRel, "relationship_skipped" -> nSkipped,
      "stock_pub" -> nPub)
  }
}
