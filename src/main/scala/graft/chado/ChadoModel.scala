package graft.chado

import org.apache.spark.sql.types._

/** Typed rows for the flat-file formats the reference parses, plus the
  * fixed Chado staging/live schemas (SURVEY.md §1).
  *
  * GFF3 row model mirrors the 8 scalar columns + attribute multi-map
  * described at lib/Modware/Loader/GFF3/Staging/Postgresql.pm:103-123 of
  * the reference; coordinates are stored 0-based interbase like
  * `featureloc` (lib/Modware/Loader/Role/WithChadoGFF3Helper.pm:328-342).
  */
case class GffRecord(
    seqId: String,
    source: Option[String],
    ftype: String,
    fmin: Int, // 0-based interbase (GFF3 start - 1)
    fmax: Int,
    score: Option[Double],
    strand: Option[Int], // +1 / -1 / None
    phase: Option[Int],
    attributes: Map[String, Seq[String]])

/** One FASTA record (embedded `##FASTA` tail or standalone file). */
case class FastaRecord(seqId: String, residues: String)

/** GAF 2.0 annotation row — 17 tab columns, pipe-multivalues split
  * (lib/Modware/Loader/GAF/Manager.pm:60-100). */
case class GafRecord(
    db: String,
    objectId: String,
    symbol: String,
    qualifier: Seq[String],
    goId: String,
    dbRef: Seq[String],
    evidenceCode: String,
    withFrom: Seq[String],
    aspect: String,
    objectName: Option[String],
    synonyms: Seq[String],
    objectType: String,
    taxon: String,
    date: String, // YYYYMMDD kept verbatim (GAF/Manager.pm:85)
    assignedBy: String,
    annotationExtension: Option[String],
    geneProductFormId: Option[String])

/** OBO term stanza (ONTO-PERL surface consumed at
  * lib/Modware/Loader/Role/Ontology/Temp/Generic.pm:38-127). */
case class OboTerm(
    id: String,
    name: Option[String],
    namespace: Option[String],
    definition: Option[String],
    comment: Option[String],
    synonyms: Seq[String],
    altIds: Seq[String],
    isObsolete: Boolean,
    isRelationshipType: Boolean)

/** OBO relationship edge: `is_a` or a typed `relationship:` tag. */
case class OboRelationship(subject: String, predicate: String, obj: String)

/** owltools closure row: 4-col TSV
  * (lib/Modware/Loader/TransitiveClosure/Staging/Postgresql.pm:53-86). */
case class ClosureRow(subject: String, predicate: String, pathdistance: Int, obj: String)

object ChadoSchema {
  // Booleans kept as 0/1 integers for parity with the reference's
  // staging DDL (share/postgresql.lib:5-6).
  val cvterm: StructType = StructType(Seq(
    StructField("cvterm_id", LongType),
    StructField("cv_id", LongType),
    StructField("name", StringType),
    StructField("definition", StringType),
    StructField("dbxref_id", LongType),
    StructField("is_obsolete", IntegerType),
    StructField("is_relationshiptype", IntegerType)))

  val cv: StructType = StructType(Seq(
    StructField("cv_id", LongType),
    StructField("name", StringType),
    StructField("definition", StringType)))

  val db: StructType = StructType(Seq(
    StructField("db_id", LongType),
    StructField("name", StringType)))

  val dbxref: StructType = StructType(Seq(
    StructField("dbxref_id", LongType),
    StructField("db_id", LongType),
    StructField("accession", StringType),
    StructField("version", StringType)))

  val cvtermRelationship: StructType = StructType(Seq(
    StructField("cvterm_relationship_id", LongType),
    StructField("type_id", LongType),
    StructField("subject_id", LongType),
    StructField("object_id", LongType)))

  val cvtermpath: StructType = StructType(Seq(
    StructField("cvtermpath_id", LongType),
    StructField("type_id", LongType),
    StructField("subject_id", LongType),
    StructField("object_id", LongType),
    StructField("cv_id", LongType),
    StructField("pathdistance", IntegerType)))

  val cvtermsynonym: StructType = StructType(Seq(
    StructField("cvtermsynonym_id", LongType),
    StructField("cvterm_id", LongType),
    StructField("synonym", StringType),
    StructField("type_id", LongType)))

  val feature: StructType = StructType(Seq(
    StructField("feature_id", LongType),
    StructField("dbxref_id", LongType),
    StructField("organism_id", LongType),
    StructField("name", StringType),
    StructField("uniquename", StringType),
    StructField("residues", StringType),
    StructField("seqlen", IntegerType),
    StructField("md5checksum", StringType),
    StructField("type_id", LongType),
    StructField("is_analysis", IntegerType),
    StructField("is_obsolete", IntegerType)))

  // 0-based interbase coordinates (WithChadoGFF3Helper.pm:328-342);
  // rank 0 = subject location, 1 = Target/query location (W2).
  val featureloc: StructType = StructType(Seq(
    StructField("featureloc_id", LongType),
    StructField("feature_id", LongType),
    StructField("srcfeature_id", LongType),
    StructField("fmin", IntegerType),
    StructField("fmax", IntegerType),
    StructField("strand", IntegerType),
    StructField("phase", IntegerType),
    StructField("rank", IntegerType)))

  val featureRelationship: StructType = StructType(Seq(
    StructField("feature_relationship_id", LongType),
    StructField("subject_id", LongType),
    StructField("object_id", LongType),
    StructField("type_id", LongType),
    StructField("rank", IntegerType)))

  val featureprop: StructType = StructType(Seq(
    StructField("featureprop_id", LongType),
    StructField("feature_id", LongType),
    StructField("type_id", LongType),
    StructField("value", StringType),
    StructField("rank", IntegerType)))

  val featureCvterm: StructType = StructType(Seq(
    StructField("feature_cvterm_id", LongType),
    StructField("feature_id", LongType),
    StructField("cvterm_id", LongType),
    StructField("pub_id", LongType),
    StructField("rank", IntegerType),
    StructField("is_not", IntegerType)))

  val analysisfeature: StructType = StructType(Seq(
    StructField("analysisfeature_id", LongType),
    StructField("feature_id", LongType),
    StructField("analysis_id", ShortType),
    StructField("rawscore", DoubleType)))

  val synonym: StructType = StructType(Seq(
    StructField("synonym_id", LongType),
    StructField("name", StringType),
    StructField("type_id", LongType),
    StructField("synonym_sgml", StringType)))
}
