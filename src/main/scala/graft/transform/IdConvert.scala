package graft.transform

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.chado.GafRecord

/** modidingoa / modrefingoa transforms (SURVEY.md F16,
  * lib/Modware/Transform/Command/modidingoa.pm:29-59, modrefingoa.pm:30-83):
  * translate GOA GAF identifiers to MOD identifiers through a mapping
  * resource. The reference slurps the resource into an in-memory hash and
  * converts line by line; here the resource is a broadcast join side
  * (ids) or a transformed array column (refs) — the same O(1)-per-row
  * lookup, distributed.
  */
object IdConvert {

  /** Parse a gp2protein resource into (other_id, mod_id) rows
    * (Convert/Resource/gp2protein.pm:27-45): each line is
    * `MOD:mod_id<TAB>DB:id;DB:id2;...`, prefixes stripped on both sides,
    * `!` comments skipped. */
  def gp2protein(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path)
      .filter(not(col("value").startsWith("!")) && col("value").contains("\t"))
      .select(split(col("value"), "\t").as("f"))
      .select(
        substring_index(element_at(col("f"), 1), ":", -1).as("mod_id"),
        explode(split(element_at(col("f"), 2), ";")).as("other"))
      .filter(col("other") =!= "")
      .select(substring_index(col("other"), ":", -1).as("other_id"), col("mod_id"))
      .dropDuplicates("other_id")

  /** Parse a GO_REF metadata file into (go_ref_id, mod_ref) rows for one
    * MOD db (Convert/Resource/goref.pm:51-88): paragraph stanzas with a
    * `go_ref_id:` line and `external_accession:` lines; the accession
    * whose prefix matches `modDb` wins. */
  def gorefMapping(spark: SparkSession, path: String,
                   modDb: String = "dictyBase_REF"): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => content.split("\n\\s*\n").iterator }
      .toDF("stanza")
      .filter(not(col("stanza").startsWith("!")))
      .select(
        regexp_extract(col("stanza"), "(?m)^go_ref_id: (\\S+)$", 1).as("go_ref_id"),
        regexp_extract(col("stanza"),
          s"(?m)^external_accession: ($modDb:\\S+)$$", 1).as("mod_ref"))
      .filter(col("go_ref_id") =!= "" && col("mod_ref") =!= "")
      .dropDuplicates("go_ref_id")
  }

  /** modidingoa: replace GAF column 2 (objectId) with its MOD id via the
    * broadcast mapping; rows without a translation are returned
    * separately (the reference warns and drops them,
    * modidingoa.pm:43-52). Returns (converted, notConverted). */
  def convertIds(gaf: Dataset[GafRecord], mapping: DataFrame): (DataFrame, DataFrame) = {
    val df = gaf.toDF()
    val joined = df.join(broadcast(mapping),
      df("objectId") === mapping("other_id"), "left_outer")
    val converted = joined.filter(col("mod_id").isNotNull)
      .withColumn("objectId", col("mod_id"))
      .drop("other_id", "mod_id")
    val dropped = joined.filter(col("mod_id").isNull).drop("other_id", "mod_id")
    (converted, dropped)
  }

  /** modrefingoa: translate the first `GO_REF`-prefixed entry of the
    * dbRef column in place (modrefingoa.pm:44-72); rows without a GO_REF
    * entry pass through untouched, GO_REFs without a mapping drop the
    * row into the second frame. */
  def convertRefs(gaf: Dataset[GafRecord], mapping: DataFrame,
                  goDb: String = "GO_REF"): (DataFrame, DataFrame) = {
    val df = gaf.toDF()
      .withColumn("goref", expr(s"get(filter(dbRef, x -> x LIKE '$goDb%'), 0)"))
    val untouched = df.filter(col("goref").isNull).drop("goref")
    val candidates = df.filter(col("goref").isNotNull)
      .join(broadcast(mapping), col("goref") === mapping("go_ref_id"), "left_outer")
    val converted = candidates.filter(col("mod_ref").isNotNull)
      .withColumn("dbRef",
        expr("transform(dbRef, x -> CASE WHEN x = goref THEN mod_ref ELSE x END)"))
      .drop("goref", "go_ref_id", "mod_ref")
    val dropped = candidates.filter(col("mod_ref").isNull)
      .drop("goref", "go_ref_id", "mod_ref")
    (untouched.unionByName(converted), dropped)
  }
}
