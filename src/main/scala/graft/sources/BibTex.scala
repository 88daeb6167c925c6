package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BibTeX source for the pub loaders (SURVEY.md §0's bibtex2chado,
  * lib/Modware/Load/Command/bibtex2chado.pm): `@type{key, field = {...}}`
  * records parsed into flat pub rows. Entries split record-wise so a
  * multi-gigabyte .bib parallelizes per record after the initial read.
  */
object BibTex {

  case class BibRecord(entryType: String, citeKey: String,
                       fields: Map[String, String])

  private val entryRe = "(?s)@(\\w+)\\s*\\{\\s*([^,\\s]+)\\s*,(.*)".r

  /** Parse one `@entry{...}` chunk (without the leading `@` split). */
  def parseEntry(chunk: String): Option[BibRecord] =
    ("@" + chunk.trim).stripSuffix("}") match {
      case entryRe(t, key, body) =>
        // field = {value} | field = "value" | field = bare,
        val fieldRe = "(\\w+)\\s*=\\s*(?:\\{([^{}]*)\\}|\"([^\"]*)\"|([^,\\s}]+))".r
        val fields = fieldRe.findAllMatchIn(body).map { m =>
          val v = Option(m.group(2)).orElse(Option(m.group(3)))
            .getOrElse(m.group(4))
          m.group(1).toLowerCase -> v.replaceAll("\\s+", " ").trim
        }.toMap
        Some(BibRecord(t.toLowerCase, key, fields))
      case _ => None
    }

  def parseString(content: String): Iterator[BibRecord] =
    content.split("(?m)^@").iterator.filter(_.trim.nonEmpty).flatMap(parseEntry)

  /** Full typed records (all fields kept) — the dictybib update path
    * needs every field for its re-emit, not just the pub-table subset. */
  def records(spark: SparkSession,
              path: String): org.apache.spark.sql.Dataset[BibRecord] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => parseString(c) }.toDS()
  }

  /** Read .bib file(s) into the pub-table shape the exporters consume:
    * (uniquename, entry_type, title, authors pipe-joined, journal, year,
    * volume, pages, pubplace). `PMID:`-prefixed cite keys are normalized
    * to the bare id (the loader's dbxref convention); `pubplace` defaults
    * to PUBMED like the dicty pub loads — the column the
    * chadopub2bib / dictynonpub2bib export predicates dispatch on. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => parseString(c) }
      .map { r =>
        val f = r.fields
        (r.citeKey.replaceFirst("^PMID:", ""), r.entryType,
          f.getOrElse("title", ""),
          f.getOrElse("author", "").split("\\s+and\\s+").filter(_.nonEmpty)
            .mkString("|"),
          f.getOrElse("journal", ""), f.getOrElse("year", ""),
          f.getOrElse("volume", ""), f.getOrElse("pages", ""),
          f.getOrElse("pubplace", "PUBMED"))
      }
      .toDF("uniquename", "entry_type", "title", "authors", "journal",
        "year", "volume", "pages", "pubplace")
  }
}
