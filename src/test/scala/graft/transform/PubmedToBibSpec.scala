package graft.transform

import graft.SparkSpec
import graft.sources.BibTex

/** pub2bib (pubmed2bibtex.xslt's field mapping as a distributed
  * transform) and dictybib (timestamp update with skip guards).
  */
class PubmedToBibSpec extends SparkSpec {
  import spark.implicits._

  private val efetchXml =
    """<?xml version="1.0" ?>
      |<PubmedArticleSet>
      |<PubmedArticle>
      |  <MedlineCitation>
      |    <PMID Version="1">21351276</PMID>
      |    <DateCompleted><Year>2013</Year><Month>03</Month></DateCompleted>
      |    <DateRevised><Year>2019</Year><Month>11</Month></DateRevised>
      |    <MedlineJournalInfo><NlmUniqueID>100892</NlmUniqueID></MedlineJournalInfo>
      |    <Article>
      |      <Journal>
      |        <ISSN IssnType="Electronic">1234-5678</ISSN>
      |        <JournalIssue><Volume>12</Volume>
      |          <PubDate><Year>2011</Year><Month>Feb</Month></PubDate>
      |        </JournalIssue>
      |        <Title>Genome Biology</Title>
      |      </Journal>
      |      <ArticleTitle>Dictyostelium genomics.</ArticleTitle>
      |      <Pagination><MedlinePgn>88-99</MedlinePgn></Pagination>
      |      <Abstract><AbstractText>Social amoeba genome work.</AbstractText></Abstract>
      |      <AuthorList>
      |        <Author><LastName>Kuspa</LastName><Initials>A</Initials></Author>
      |        <Author><LastName>Loomis</LastName><Initials>WF</Initials></Author>
      |      </AuthorList>
      |    </Article>
      |  </MedlineCitation>
      |  <PubmedData>
      |    <PublicationStatus>ppublish</PublicationStatus>
      |    <ArticleIdList>
      |      <ArticleId IdType="pubmed">21351276</ArticleId>
      |      <ArticleId IdType="doi">10.1000/gb.2011.12</ArticleId>
      |    </ArticleIdList>
      |  </PubmedData>
      |</PubmedArticle>
      |<PubmedArticle>
      |  <MedlineCitation><PMID>999</PMID>
      |    <Article><ArticleTitle>Minimal.</ArticleTitle></Article>
      |  </MedlineCitation>
      |  <PubmedData><PublicationStatus>aheadofprint</PublicationStatus></PubmedData>
      |</PubmedArticle>
      |</PubmedArticleSet>
      |""".stripMargin

  test("pub2bib: efetch XML parses per article and serializes like the xslt") {
    val f = java.nio.file.Files.createTempFile("efetch", ".xml")
    java.nio.file.Files.writeString(f, efetchXml)
    val articles = PubmedToBib.read(spark, f.toString).collect()
      .map(a => a.pmid -> a).toMap
    assert(articles.keySet == Set("21351276", "999"))
    val a = articles("21351276")
    assert(a.title == "Dictyostelium genomics." && a.journal == "Genome Biology")
    assert(a.authors == Seq("Kuspa, A", "Loomis, WF"))
    assert(a.doi == "10.1000/gb.2011.12" && a.nlmuniqueid == "100892")
    // year/month come from PubDate, NOT the leading DateCompleted/
    // DateRevised curation dates
    assert(a.year == "2011" && a.month == "Feb")
    assert(a.pages == "88-99" && a.status == "ppublish")

    val bib = PubmedToBib.toBibtex(
      PubmedToBib.read(spark, f.toString)).as[String].collect().mkString("\n")
    assert(bib.contains("@article{pmid21351276,"))
    assert(bib.contains("    author = {Kuspa, A and Loomis, WF},"))
    assert(bib.contains("    doi = {10.1000/gb.2011.12},"))
    assert(bib.contains("    status = {ppublish}"))
    // empty optionals are omitted (the xslt's string-length guards)
    val minimal = bib.split("(?=@article)").find(_.contains("pmid999")).get
    assert(!minimal.contains("journal =") && !minimal.contains("doi ="))
  }

  test("dictybib: stamps unstamped store-known entries, skips the rest") {
    val entries = spark.createDataset(Seq(
      BibTex.BibRecord("article", "pmid1", Map(
        "pmid" -> "1", "title" -> "one", "journal" -> "J", "year" -> "2001",
        "volume" -> "5", "author" -> "A B and C D")),
      BibTex.BibRecord("article", "pmid2", Map( // already stamped -> skip
        "pmid" -> "2", "title" -> "two", "timestamp" -> "2020.01.01")),
      BibTex.BibRecord("article", "pmid3", Map( // not in store -> skip
        "pmid" -> "3", "title" -> "three")),
      BibTex.BibRecord("article", "pmid4", Map( // 1990s legacy date
        "pmid" -> "4", "title" -> "old"))))
    val pubs = Seq(("1", "12-AUG-26"), ("2", "01-JAN-20"), ("4", "15-JUN-98"))
      .toDF("uniquename", "created_at")
    val out = PubmedToBib.dictybib(entries, pubs).as[String].collect()
    assert(out.length == 2)
    // POSIX two-digit-century rule: 98 -> 1998, not Java's 2098
    assert(out.exists(_.contains("timestamp = {1998.06.15}")))
    val e = out.find(_.startsWith("@article{pmid1,")).get
    // the reference's fixed order: six always-fields (empty allowed),
    // then present optionals, author, timestamp
    assert(e.contains("journal = {J},") && e.contains("status = {},"))
    assert(e.contains("volume = {5},") && !e.contains("pages ="))
    assert(e.contains("author = {A B and C D},"))
    assert(e.contains("timestamp = {2026.08.12}"))
  }
}
