package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.chado.GafRecord

/** dictygaf2chado annotation load, Spark-first (SURVEY.md §3.4):
  * prune-all + reload of `feature_cvterm` with broadcast dictionary
  * joins replacing the reference's pre-warmed in-memory id stashes
  * (lib/Modware/Loader/Role/GAF/IdStash.pm:86-131, J9), the validity
  * filter (P10: row kept only when gene, term and evidence all resolve,
  * lib/Modware/Loader/GAF/Row.pm:71-83), and the per-(feature,term,pub)
  * rank ordinal via one window (A2, lib/Modware/Loader/GAF.pm:64-80).
  */
object GafLoad {

  /** Resolve + filter + rank: returns the feature_cvterm-shaped frame
    * with one deterministic `rank` per (gene, term, pub) group.
    *
    * `genes`: (gene_id, feature_uniquename); `terms`: (go_id, cv_name).
    * Both are dimension-sized → broadcast (the IdStash analog).
    */
  def load(gaf: Dataset[GafRecord], genes: DataFrame, terms: DataFrame): DataFrame = {
    val rows = gaf.toDF()
      .select(col("objectId"), col("goId"), col("evidenceCode"),
        explode_outer(col("dbRef")).as("pub"),
        col("qualifier"), col("date"), col("withFrom"), col("assignedBy"))
    val resolved = rows
      .join(broadcast(genes), rows("objectId") === genes("gene_id"), "left_outer")
      .join(broadcast(terms), rows("goId") === terms("go_id"), "left_outer")
    // P10 validity: drop rows that failed any dictionary lookup
    val valid = resolved.filter(
      col("feature_uniquename").isNotNull && col("cv_name").isNotNull &&
        col("evidenceCode") =!= "" && col("pub").isNotNull)
    // A2: rank = dense ordinal within (feature, term, pub), ordered by
    // the row's payload for determinism
    val w = Window.partitionBy(col("feature_uniquename"), col("goId"), col("pub"))
      .orderBy(col("evidenceCode"), col("date"), col("assignedBy"))
    valid.withColumn("rank", row_number().over(w) - 1)
      .select(col("feature_uniquename"), col("goId"), col("cv_name"),
        col("pub"), col("evidenceCode"), col("date"), col("rank"))
  }

  /** U4 — duplicate-gene fan-out: copy annotation rows to each sibling id
    * in the dup map (AppendDuplicate.pm:43-66). */
  def fanoutDuplicates(annotations: DataFrame, dupMap: DataFrame): DataFrame = {
    // dupMap: (gene_id, sibling_id)
    val copies = annotations
      .join(broadcast(dupMap), annotations("feature_uniquename") === dupMap("gene_id"))
      .drop("feature_uniquename", "gene_id")
      .withColumnRenamed("sibling_id", "feature_uniquename")
    annotations.unionByName(copies.select(annotations.columns.toIndexedSeq.map(col): _*))
  }
}
