package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** chado2canonicalgff3, Spark-first (SURVEY.md §3.3): the reference
  * walks organism → reference → gene → transcript → exon/CDS with one
  * SQL round-trip per parent row (N+1, EventEmitter/Feature/Chado/
  * Canonical.pm:75-185) and parallelizes per-chromosome with a bash job
  * pool. Here the whole hierarchy is one set-based join pass and the
  * output order is a single sort — per-reference partitioning replaces
  * the process pool.
  *
  * Order-sensitive output (SURVEY.md §7 risk 3) is handled with explicit
  * sort keys carried to the final write — never partition concatenation
  * order, which coalescing writers do not preserve.
  */
object Gff3Export {

  /** Rank features for parent-before-child emission within a reference. */
  private val typeRank = typedlit(Map(
    "chromosome" -> 0, "contig" -> 1, "supercontig" -> 1, "gene" -> 2,
    "mRNA" -> 3, "tRNA" -> 3, "rRNA" -> 3, "ncRNA" -> 3, "pseudogene" -> 3,
    "exon" -> 4, "CDS" -> 5, "polypeptide" -> 6))

  private def esc(c: org.apache.spark.sql.Column) =
    // GFF3 reserved-character escaping for column 9 values
    regexp_replace(regexp_replace(regexp_replace(c,
      "%", "%25"), ";", "%3B"), "=", "%3D")

  /** Feature lines with their ordering columns attached:
    * (srcfeature, type_rank, fmin, uniquename, value).
    *
    * Input columns: uniquename, name, ftype, srcfeature, fmin, fmax,
    * score (nullable double), strand (nullable int), phase (nullable
    * int), source (nullable), parent (nullable).
    */
  private def featureLines(features: DataFrame): DataFrame = {
    val attrs = concat(
      lit("ID="), esc(col("uniquename")),
      when(col("name").isNotNull, concat(lit(";Name="), esc(col("name")))).otherwise(lit("")),
      when(col("parent").isNotNull, concat(lit(";Parent="), esc(col("parent")))).otherwise(lit("")))
    val line = concat_ws("\t",
      col("srcfeature"),
      coalesce(col("source"), lit(".")),
      col("ftype"),
      (col("fmin") + 1).cast("string"), // 0-based interbase -> 1-based (F8)
      col("fmax").cast("string"),
      // F10: sprintf("%.3g", score) like blast2chadogff3.pm:293
      when(col("score").isNotNull, format_string("%.3g", col("score"))).otherwise("."),
      when(col("strand") === 1, "+").when(col("strand") === -1, "-").otherwise("."), // F7
      coalesce(col("phase").cast("string"), lit(".")),
      attrs)
    features
      .withColumn("type_rank", coalesce(typeRank(col("ftype")), lit(9)))
      .select(col("srcfeature"), col("type_rank"), col("fmin"),
        col("uniquename"), line.as("value"))
  }

  /** Serialize a feature frame into ordered GFF3 lines: parent before
    * child (type rank), then fmin, within each reference. */
  def toGff3Lines(features: DataFrame): DataFrame =
    featureLines(features)
      .orderBy(col("srcfeature"), col("type_rank"), col("fmin"), col("uniquename"))
      .select(col("value"))

  /** `##gff-version` + `##sequence-region` pragmas from reference spans
    * (FeatureWriter/GFF3.pm:16-39). */
  def pragmas(references: DataFrame): DataFrame = {
    val regions = references
      .select(lit(1).as("prag_rank"),
        concat(lit("##sequence-region "), col("uniquename"), lit(" 1 "),
          col("seqlen").cast("string")).as("value"))
    val version = regions.sparkSession.range(1)
      .select(lit(0).as("prag_rank"), lit("##gff-version 3").as("value"))
    version.unionByName(regions)
      .orderBy(col("prag_rank"), col("value"))
      .select(col("value"))
  }

  /** Whole GFF3 document — pragmas then ordered feature lines — as one
    * globally sorted frame safe for a single-file write. */
  def document(references: DataFrame, features: DataFrame): DataFrame = {
    val head = references
      .select(concat(lit("##sequence-region "), col("uniquename"), lit(" 1 "),
        col("seqlen").cast("string")).as("value"))
      .withColumn("doc_rank", lit(1))
      .withColumn("srcfeature", lit(""))
      .withColumn("type_rank", lit(0)).withColumn("fmin", lit(0))
      .withColumn("uniquename", col("value"))
    val version = features.sparkSession.range(1)
      .select(lit("##gff-version 3").as("value"), lit(0).as("doc_rank"),
        lit("").as("srcfeature"), lit(0).as("type_rank"), lit(0).as("fmin"),
        lit("").as("uniquename"))
    val body = featureLines(features).withColumn("doc_rank", lit(2))
    version.unionByName(head).unionByName(body)
      .orderBy(col("doc_rank"), col("srcfeature"), col("type_rank"),
        col("fmin"), col("uniquename"))
      .select(col("value"))
  }
}
