package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.chado.{OboRelationship, OboTerm}

/** OBO ontology source (SURVEY.md S3): stanza-splitting parser replacing
  * the reference's ONTO-PERL object graph (consumed at
  * lib/Modware/Loader/Role/Ontology/Temp/Generic.pm:38-127).
  *
  * Files are split on blank-line-delimited `[Term]` / `[Typedef]`
  * stanzas. OBO headers are small and stanzas are independent, so the
  * parse distributes by splitting each file's text once on the driver of
  * the partition (`wholeTextFiles`) and exploding stanzas into rows; at
  * scale, ontologies are dimension-sized (thousands of terms), never the
  * 100 TB fact side.
  */
object Obo {

  /** Tag values for one stanza, in order. */
  private def tagValues(stanza: Seq[String], tag: String): Seq[String] =
    stanza.filter(_.startsWith(tag + ":")).map { l =>
      val v = l.drop(tag.length + 1).trim
      // strip trailing OBO comments (" ! ...") outside quotes
      val bang = v.indexOf(" ! ")
      if (bang >= 0 && !v.take(bang).contains("\"")) v.take(bang).trim else v
    }

  private def firstTag(stanza: Seq[String], tag: String): Option[String] =
    tagValues(stanza, tag).headOption

  /** Extract the quoted part of a def:/synonym: value. */
  private def quoted(v: String): String = {
    val a = v.indexOf('"')
    val b = if (a >= 0) v.indexOf('"', a + 1) else -1
    if (a >= 0 && b > a) v.substring(a + 1, b) else v
  }

  /** Parse an OBO document into (header lines, stanzas). */
  def split(content: String): (Seq[String], Seq[Seq[String]]) = {
    val blocks = content.split("\n\\s*\n").toSeq.map(_.linesIterator.map(_.trim)
      .filter(_.nonEmpty).toSeq).filter(_.nonEmpty)
    val (stanzas, header) = blocks.partition(b => b.head.startsWith("["))
    (header.flatten, stanzas)
  }

  def parseTerms(content: String): Seq[OboTerm] = {
    val (_, stanzas) = split(content)
    stanzas.filter(s => s.head == "[Term]" || s.head == "[Typedef]").flatMap { s =>
      val body = s.tail
      firstTag(body, "id").map { id =>
        OboTerm(
          id = id,
          name = firstTag(body, "name"),
          namespace = firstTag(body, "namespace"),
          definition = firstTag(body, "def").map(quoted),
          comment = firstTag(body, "comment"),
          synonyms = tagValues(body, "synonym").map(quoted),
          altIds = tagValues(body, "alt_id"),
          isObsolete = firstTag(body, "is_obsolete").contains("true"),
          isRelationshipType = s.head == "[Typedef]")
      }
    }
  }

  def parseRelationships(content: String): Seq[OboRelationship] = {
    val (_, stanzas) = split(content)
    stanzas.filter(_.head == "[Term]").flatMap { s =>
      val body = s.tail
      firstTag(body, "id").toSeq.flatMap { id =>
        val isa = tagValues(body, "is_a").map(o => OboRelationship(id, "is_a", o))
        val rels = tagValues(body, "relationship").flatMap { v =>
          v.split("\\s+") match {
            case Array(pred, obj, _*) => Some(OboRelationship(id, pred, obj))
            case _ => None
          }
        }
        isa ++ rels
      }
    }
  }

  /** Header metadata tags (format-version, date, default-namespace, ...),
    * as (tag, value) pairs — the version-gate input
    * (lib/Modware/Loader/Ontology.pm:84-94). */
  def parseHeader(content: String): Map[String, String] = {
    val (header, _) = split(content)
    header.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None else Some(l.take(c) -> l.drop(c + 1).trim)
    }.toMap
  }

  /** Header of the first OBO file at `path` (driver-side read — headers
    * are a few lines and gate control flow, not the data plane). */
  def header(spark: SparkSession, path: String): Map[String, String] =
    spark.sparkContext.wholeTextFiles(path).map { case (_, c) => parseHeader(c) }
      .collect().headOption.getOrElse(Map.empty)

  /** The header `date:` tag parsed with the reference's `%d:%m:%Y %H:%M`
    * pattern (Ontology.pm:84-94) — the version-gate comparand. */
  def headerDate(header: Map[String, String]): Option[java.time.LocalDateTime] =
    header.get("date").flatMap { d =>
      try Some(java.time.LocalDateTime.parse(d,
        java.time.format.DateTimeFormatter.ofPattern("dd:MM:yyyy HH:mm")))
      catch { case _: java.time.format.DateTimeParseException => None }
    }

  def terms(spark: SparkSession, path: String): Dataset[OboTerm] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => parseTerms(c) }.toDS()
  }

  def relationships(spark: SparkSession, path: String): Dataset[OboRelationship] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => parseRelationships(c) }.toDS()
  }
}
