package graft.transform

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** pub2bib (lib/Modware/Transform/Command/pub2bib.pm): the reference
  * fetches PubMed efetch XML over HTTP (driver-side, SURVEY.md S11) and
  * XSLT-transforms it to BibTeX (share/pubmed2bibtex.xslt). The engine
  * half is the transform: article records parse out of the XML and
  * serialize as BibTeX with the stylesheet's field set — title, author,
  * journal/year/month/volume/pages/issn, abstract, doi, nlmuniqueid,
  * pmid, status.
  *
  * Scale shape: each FILE is read whole (`wholeTextFiles`), split into
  * `<PubmedArticle>` blocks, then repartitioned so DOM parsing runs per
  * article (per-task JDK parser, no external XML library). The
  * whole-file read bounds a single input file to what one task can hold
  * (< 2 GB JVM string limit) — a multi-gigabyte efetch corpus must
  * arrive as multiple files (which is how efetch batching emits it);
  * only the cheap regex block-split is per-file serial, the parse is
  * per-article parallel either way.
  */
object PubmedToBib {

  case class PubArticle(
      pmid: String,
      title: String,
      authors: Seq[String],
      journal: String,
      year: String,
      month: String,
      volume: String,
      pages: String,
      issn: String,
      abstractText: String,
      doi: String,
      nlmuniqueid: String,
      status: String)

  /** DOM-parse one `<PubmedArticle>` block. */
  def parseArticle(xml: String): Option[PubArticle] =
    try {
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
      def texts(scope: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
        val nl = scope.getElementsByTagName(tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
      }
      val root = doc.getDocumentElement
      def first(scope: org.w3c.dom.Element, tag: String): String =
        texts(scope, tag).headOption.map(_.getTextContent.trim).getOrElse("")
      val pmid = first(root, "PMID")
      if (pmid.isEmpty) None
      else {
        val authors = texts(root, "Author").map { a =>
          Seq(first(a, "LastName"), first(a, "Initials")).filter(_.nonEmpty)
            .mkString(", ")
        }.filter(_.nonEmpty)
        val doi = texts(root, "ArticleId")
          .find(_.getAttribute("IdType") == "doi")
          .map(_.getTextContent.trim).getOrElse("")
        // Year/Month MUST come from the publication date, not whichever
        // <Year> happens first in the record — real efetch XML leads
        // with DateCompleted/DateRevised (the curation dates). Volume
        // and the journal Title are likewise scoped to their parents.
        val pubDate = texts(root, "PubDate").headOption
        val journal = texts(root, "Journal").headOption
        val issue = texts(root, "JournalIssue").headOption
        Some(PubArticle(pmid, first(root, "ArticleTitle"), authors,
          journal.map(first(_, "Title")).getOrElse(""),
          pubDate.map(first(_, "Year")).getOrElse(""),
          pubDate.map(first(_, "Month")).getOrElse(""),
          issue.map(first(_, "Volume")).getOrElse(""),
          first(root, "MedlinePgn"),
          journal.map(first(_, "ISSN")).getOrElse(""),
          first(root, "AbstractText"), doi,
          first(root, "NlmUniqueID"), first(root, "PublicationStatus")))
      }
    } catch { case _: Exception => None }

  /** Read efetch XML file(s) into article records, one task per block
    * batch. */
  def read(spark: SparkSession, path: String): Dataset[PubArticle] = {
    import spark.implicits._
    val blockRe = "(?s)<PubmedArticle\\b.*?</PubmedArticle>".r
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => blockRe.findAllIn(c) }
      // round-robin the blocks so the DOM work spreads beyond the
      // one-partition-per-file layout wholeTextFiles returns
      .repartition(spark.sparkContext.defaultParallelism)
      .toDS()
      .flatMap(b => parseArticle(b))
  }

  /** Serialize as BibTeX in the stylesheet's shape, ordered by pmid.
    * Empty optional fields are omitted like the xslt's length guards. */
  def toBibtex(articles: Dataset[PubArticle]): DataFrame = {
    import articles.sparkSession.implicits._
    articles.map { a =>
      val opt = Seq(
        "author" -> a.authors.mkString(" and "), "title" -> a.title,
        "journal" -> a.journal, "year" -> a.year, "month" -> a.month,
        "volume" -> a.volume, "pages" -> a.pages, "issn" -> a.issn,
        "abstract" -> a.abstractText, "doi" -> a.doi,
        "nlmuniqueid" -> a.nlmuniqueid)
        .collect { case (k, v) if v.nonEmpty => s"    $k = {$v}," }
      ((s"@article{pmid${a.pmid}," +: opt) ++
        Seq(s"    pmid = {${a.pmid}},", s"    status = {${a.status}}", "}"))
        .mkString("\n")
    }.toDF("value")
      .orderBy(col("value"))
  }

  /** dictybib (lib/Modware/Update/Command/dictybib.pm): re-emit BibTeX
    * entries that (a) carry no `timestamp` field yet and (b) exist in
    * the pub store, stamped with the store's `created_at` date
    * (dd-MMM-yy in the dicty schema) as `timestamp = {yyyy.mm.dd}` in
    * the reference's fixed field order. Entries already stamped or
    * unknown to the store are skipped, like the `next ENTRY` guards. */
  def dictybib(entries: Dataset[graft.sources.BibTex.BibRecord],
               pubs: DataFrame): DataFrame = {
    val spark = entries.sparkSession
    import spark.implicits._
    val pending = entries
      .filter(r => !r.fields.contains("timestamp"))
      .map(r => (r.fields.getOrElse("pmid",
        r.citeKey.replaceFirst("^(?i)pmid:?", "")), r))
      .toDF("pmid", "rec")
    val stamped = pubs.select(col("uniquename").as("pmid"),
      date_format(
        graft.functions.GenomicFunctions.legacyDate(col("created_at")),
        "yyyy.MM.dd").as("ts"))
    pending.join(stamped, Seq("pmid"))
      .filter(col("ts").isNotNull)
      .orderBy(col("pmid"))
      .select(col("rec").as[graft.sources.BibTex.BibRecord], col("ts").as[String])
      .map { case (r, ts) =>
        // the reference's exact emit order (dictybib.pm sub bibtex):
        // six always-present fields, six optionals, author, timestamp
        val always = Seq("journal", "title", "status", "nlmuniqueid",
          "pmid", "year").map(k => s"${k} = {${r.fields.getOrElse(k, "")}},")
        val opts = Seq("volume", "pages", "doi", "month", "issn", "abstract")
          .collect { case k if r.fields.contains(k) => s"$k = {${r.fields(k)}}," }
        ((s"@article{${r.citeKey}," +: (always ++ opts)) ++
          Seq(s"author = {${r.fields.getOrElse("author", "")}},",
            s"timestamp = {$ts}", "}")).mkString("\n")
      }.toDF("value")
  }
}
