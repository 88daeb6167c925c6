package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.chado.GafRecord

/** GAF 2.0 source (SURVEY.md S4): 17 tab columns, `!` comment lines
  * skipped, pipe-joined multi-values split at the parse edge
  * (lib/Modware/Loader/GAF/Manager.pm:60-100).
  */
object Gaf {

  private def pipeSplit(v: String): Seq[String] =
    if (v == null || v.isEmpty) Seq.empty else v.split("\\|").toSeq.filter(_.nonEmpty)

  private def opt(v: String): Option[String] =
    Option(v).filter(_.nonEmpty)

  def parseLine(line: String): Option[GafRecord] = {
    if (line.startsWith("!") || line.trim.isEmpty) None
    else {
      val f = line.split("\t", -1).padTo(17, "")
      Some(GafRecord(
        db = f(0), objectId = f(1), symbol = f(2),
        qualifier = pipeSplit(f(3)),
        goId = f(4),
        dbRef = pipeSplit(f(5)),
        evidenceCode = f(6),
        withFrom = pipeSplit(f(7)),
        aspect = f(8),
        objectName = opt(f(9)),
        synonyms = pipeSplit(f(10)),
        objectType = f(11),
        taxon = f(12),
        date = f(13),
        assignedBy = f(14),
        annotationExtension = opt(f(15)),
        geneProductFormId = opt(f(16))))
    }
  }

  def read(spark: SparkSession, path: String): Dataset[GafRecord] =
    parse(spark.read.textFile(path))

  /** The same parse gate over an in-memory line Dataset — the entry
    * point the oracle row (q103) uses; [[read]] is exactly
    * `parse(textFile(path))`. */
  def parse(lines: Dataset[String]): Dataset[GafRecord] = {
    import lines.sparkSession.implicits._
    lines.flatMap(parseLine _)
  }

  /** Serialize back to 17-col GAF rows (SURVEY.md K6): arrays re-joined
    * with `|`, fixed column order, as a single text `value` column. */
  def format(ds: Dataset[GafRecord]): org.apache.spark.sql.DataFrame =
    ds.select(concat_ws("\t",
      col("db"), col("objectId"), col("symbol"),
      concat_ws("|", col("qualifier")),
      col("goId"),
      concat_ws("|", col("dbRef")),
      col("evidenceCode"),
      concat_ws("|", col("withFrom")),
      col("aspect"),
      coalesce(col("objectName"), lit("")),
      concat_ws("|", col("synonyms")),
      col("objectType"), col("taxon"), col("date"), col("assignedBy"),
      coalesce(col("annotationExtension"), lit("")),
      coalesce(col("geneProductFormId"), lit(""))).as("value"))
}
