package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stock-center dump commands (SURVEY.md §0's modware-dump surface:
  * lib/Modware/Dump/Command/dictystrain.pm, dictyplasmid.pm): the
  * reference walks the legacy StockCenter resultset row by row and
  * writes one TSV per requested data kind; here each kind is a
  * projection/join over the stock frames and the files are ordered
  * tab-joined line frames.
  */
object StockExport {

  /** Sequential `DSC_G%07d` ids in dump order (dictystrain.pm:36-41);
    * dump order here is deterministic stock_id order. The global window
    * is the oracle-expressible form of sequence allocation — a real
    * 100 TB dump would allocate per-partition ranges, but a stock
    * catalog is dimension-sized. */
  def withDscgIds(strains: DataFrame): DataFrame =
    strains.withColumn("dscg_id",
      format_string("DSC_G%07d", row_number().over(Window.orderBy(col("stock_id")))))

  /** strain.tsv rows: id, descriptor, species, description (from the
    * `description` prop, empty when absent) — dictystrain.pm:43-66. */
  def strainLines(strains: DataFrame, props: DataFrame): DataFrame = {
    val desc = props.filter(col("prop_name") === "description")
      .select(col("stock_id"), col("value").as("description"))
    strains.join(desc, Seq("stock_id"), "left_outer")
      .select(concat_ws("\t", col("stock_id"), trim(col("descriptor")),
        coalesce(col("species"), lit("")),
        coalesce(trim(col("description")), lit(""))).as("value"),
        col("stock_id"))
      .orderBy(col("stock_id")).select(col("value"))
  }

  /** inventory.tsv rows: id, prop, value for inventory-ish props
    * (dictystrain.pm's inventory data kind). */
  def inventoryLines(props: DataFrame,
      inventoryProps: Seq[String] = Seq("location", "color", "number_of_vials",
        "storage_date", "obtained_as")): DataFrame =
    props.filter(col("prop_name").isin(inventoryProps: _*))
      .select(concat_ws("\t", col("stock_id"), col("prop_name"),
        coalesce(col("value"), lit(""))).as("value"),
        col("stock_id"), col("prop_name"))
      .orderBy(col("stock_id"), col("prop_name")).select(col("value"))

  /** Generic per-kind prop dump (the reference's other `data` kinds:
    * publications, genotype, phenotype — dictystrain.pm's data list):
    * `id \t value` lines for one prop kind. */
  def propKindLines(props: DataFrame, kind: String): DataFrame =
    props.filter(col("prop_name") === kind)
      .select(concat_ws("\t", col("stock_id"), coalesce(col("value"), lit("")))
        .as("value"), col("stock_id"))
      .orderBy(col("stock_id"), col("value")).select(col("value"))

  /** props.tsv rows: every (id, prop, value) triple — the reference's
    * `props` data kind dumps the full property bag, unlike the
    * inventory/genotype/... kinds which slice it. */
  def allPropLines(props: DataFrame): DataFrame =
    props
      .select(concat_ws("\t", col("stock_id"), col("prop_name"),
        coalesce(col("value"), lit(""))).as("value"),
        col("stock_id"), col("prop_name"))
      .orderBy(col("stock_id"), col("prop_name"), col("value"))
      .select(col("value"))

  /** parent.tsv rows: id, parent descriptor — the reference's `parent`
    * data kind (Role/Stock/Export/Strain.pm find_strain_parent), the
    * J11 self-join resolved set-based; strains without a resolvable
    * parent are skipped like the reference's `if` guard. */
  def parentLines(strains: DataFrame): DataFrame =
    graft.etl.StockImport.withParents(strains)
      // roots (no parent link) are skipped like the reference's guard;
      // a linked parent with a blank descriptor still emits its row —
      // empty-coalesced like every other line builder here
      .filter(col("parent_id").isNotNull)
      .select(concat_ws("\t", col("stock_id"),
        coalesce(trim(col("parent_descriptor")), lit(""))).as("value"),
        col("stock_id"))
      .orderBy(col("stock_id")).select(col("value"))

  /** plasmid.tsv rows: id, name, description — dictyplasmid.pm. */
  def plasmidLines(plasmids: DataFrame): DataFrame =
    plasmids.select(concat_ws("\t", col("stock_id"), trim(col("name")),
      coalesce(trim(col("description")), lit(""))).as("value"), col("stock_id"))
      .orderBy(col("stock_id")).select(col("value"))
}
