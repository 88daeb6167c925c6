package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Minimal GenBank flat-file scanner (SURVEY.md S6): LOCUS records split
  * on `//`, with per-record feature table entries (gene/mRNA/CDS keys and
  * their location + qualifiers) and the ORIGIN sequence — the subset the
  * reference's genome loader consumes
  * (lib/Modware/Loader/Genome/GenBank.pm:384-531).
  */
object GenBank {

  case class GbFeature(key: String, location: String,
                       qualifiers: Map[String, String])
  /** `contig` holds the CONTIG header annotation (the `join(...)` of
    * contig accessions and gaps an assembly scaffold record carries —
    * Modware/Loader/Genome/GenBank/Assembly.pm:307-317); empty for
    * ordinary records. */
  case class GbRecord(locus: String, length: Int, features: Seq[GbFeature],
                      sequence: String, contig: String = "")

  def parseRecord(text: String): Option[GbRecord] = {
    val lines = text.linesIterator.toArray
    val locusLine = lines.find(_.startsWith("LOCUS")) getOrElse { return None }
    val locusParts = locusLine.split("\\s+")
    val locus = if (locusParts.length > 1) locusParts(1) else return None
    val length = locusParts.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(0)

    val featStart = lines.indexWhere(_.startsWith("FEATURES"))
    val originStart = lines.indexWhere(_.startsWith("ORIGIN"))
    val featEnd = if (originStart >= 0) originStart else lines.length

    val features = scala.collection.mutable.ArrayBuffer.empty[GbFeature]
    if (featStart >= 0) {
      var key: String = null
      var location = new StringBuilder
      val quals = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var lastQual: String = null
      def flush(): Unit = if (key != null) {
        features += GbFeature(key, location.toString, quals.toMap)
        key = null; location = new StringBuilder; quals.clear(); lastQual = null
      }
      // a non-indented line after FEATURES is a new header keyword
      // (CONTIG, BASE COUNT, ORIGIN) — the feature table is over
      val featLines = lines.slice(featStart + 1, featEnd)
        .takeWhile(l => l.isEmpty || l.head.isWhitespace)
      for (line <- featLines if line.length > 5) {
        val keyField = line.slice(5, 20).trim
        val rest = if (line.length > 21) line.drop(21).trim else ""
        if (keyField.nonEmpty) { // new feature entry
          flush(); key = keyField; location ++= rest
        } else if (rest.startsWith("/")) { // qualifier
          val eq = rest.indexOf('=')
          val (q, v) = if (eq < 0) (rest.drop(1), "")
          else (rest.slice(1, eq), rest.drop(eq + 1).stripPrefix("\"").stripSuffix("\""))
          quals(q) = v; lastQual = q
        } else if (lastQual != null) { // qualifier continuation
          quals(lastQual) = quals(lastQual) + rest.stripSuffix("\"")
        } else location ++= rest // location continuation
      }
      flush()
    }

    val sequence = if (originStart < 0) ""
    else lines.drop(originStart + 1).takeWhile(!_.startsWith("//"))
      .map(_.replaceAll("[0-9\\s]", "")).mkString("").toUpperCase

    // CONTIG annotation: keyword line + indented continuations, joined
    // without whitespace (the location string may wrap mid-accession)
    val contigStart = lines.indexWhere(_.startsWith("CONTIG"))
    val contig = if (contigStart < 0) ""
    else (lines(contigStart).drop(6).trim +:
      lines.drop(contigStart + 1)
        .takeWhile(l => l.nonEmpty && l.head.isWhitespace).map(_.trim).toSeq)
      .mkString("")

    Some(GbRecord(locus, length, features.toSeq, sequence, contig))
  }

  def read(spark: SparkSession, path: String): Dataset[GbRecord] = {
    import spark.implicits._
    parse(spark.sparkContext.wholeTextFiles(path).values.toDS())
  }

  /** The same record split + parse over in-memory file contents — the
    * entry point the oracle row (q110) uses; [[read]] is exactly
    * `parse(wholeTextFiles(path).values)`. */
  def parse(contents: Dataset[String]): Dataset[GbRecord] = {
    import contents.sparkSession.implicits._
    contents.flatMap(content =>
      content.split("(?m)^//\\s*$").iterator.flatMap(parseRecord))
  }
}
