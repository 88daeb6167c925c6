package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.chado.FastaRecord

/** FASTA source + sink (SURVEY.md S2 / K5).
  *
  * Reading splits on `>` headers; writing is the reference's 60-char wrap
  * (lib/Modware/Export/Command/chado2fasta.pm:359-379) done as one
  * codegen'd `regexp_replace` projection — no per-row Perl loop.
  */
object Fasta {

  /** Parse a FASTA string into records. */
  def parseString(content: String): Iterator[FastaRecord] =
    content.split("(?m)^>").iterator.filter(_.trim.nonEmpty).map { chunk =>
      val lines = chunk.split("\n", -1)
      val id = lines.head.trim.split("\\s+").head
      FastaRecord(id, lines.tail.map(_.trim).mkString(""))
    }

  /** Read FASTA file(s); one record per `>` entry. `wholeTextFiles` keeps
    * header/sequence adjacency (a header and its residues never split). */
  def read(spark: SparkSession, path: String): Dataset[FastaRecord] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseString(content) }
      .toDS()
  }

  /** Format (id, residues) rows as FASTA text lines: `>id` + 60-char
    * wrapped residues (F6). Returns a single `value` string column ready
    * for `text` write. */
  def format(df: DataFrame, idCol: String, residuesCol: String): DataFrame =
    df.select(concat(
      lit(">"), col(idCol), lit("\n"),
      rtrim(regexp_replace(col(residuesCol), "(.{1,60})", "$1\n"), "\n")).as("value"))

  /** Write FASTA to `path` with deterministic record order by id.
    * Default layout is range-partitioned + sorted-within-partition:
    * part files concatenate in filename order to the globally id-sorted
    * FASTA, with no single-partition stage (scale-safe). `singleFile`
    * opts into one coalesced file for small outputs. `gzip=true`
    * compresses the part files (K8, the reference's tar.gz output role —
    * lib/Modware/Role/Command/CanCompress.pm). */
  def write(df: DataFrame, idCol: String, residuesCol: String, path: String,
            gzip: Boolean = false, singleFile: Boolean = false): Unit = {
    val ordered =
      if (singleFile) format(df.orderBy(col(idCol)), idCol, residuesCol).coalesce(1)
      else format(df.repartitionByRange(col(idCol))
        .sortWithinPartitions(col(idCol)), idCol, residuesCol)
    val w = ordered.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).text(path)
  }
}
