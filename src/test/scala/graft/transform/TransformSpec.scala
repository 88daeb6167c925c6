package graft.transform

import graft.SparkSpec
import graft.etl.StockImport
import graft.operators.Overlap
import graft.report.SumStats
import graft.sinks.JdbcStore
import graft.sources.{GenBank, Gff3}
import org.apache.spark.sql.functions._

class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("overlap grouping chains overlapping intervals (J13)") {
    val df = Seq(
      ("h1", 0, 100), ("h1", 50, 150), ("h1", 140, 200), // one chain
      ("h1", 500, 600), // separate chain
      ("h2", 0, 10)) // other key
      .toDF("hit", "s", "e")
    val got = Overlap.assignGroups(df, Seq($"hit"), $"s", $"e")
      .select($"hit", $"s", $"group_id").as[(String, Int, Long)].collect().toSet
    assert(got == Set(("h1", 0, 1L), ("h1", 50, 1L), ("h1", 140, 1L),
      ("h1", 500, 2L), ("h2", 0, 1L)))
  }

  test("blast transform filters by evalue, groups HSPs, formats %.3g") {
    val hsps = Seq(
      "q1\ts1\t98.5\t100\t1\t0\t1\t100\t1000\t1099\t1e-30\t190",
      "q1\ts1\t97.0\t80\t2\t0\t90\t170\t1080\t1159\t1e-20\t150", // overlaps -> same group
      "q1\ts1\t90.0\t50\t5\t0\t200\t250\t5000\t5049\t1e-5\t80", // separate group
      "q1\ts1\t50.0\t30\t9\t1\t1\t30\t9000\t9029\t20.0\t20", // fails cutoff
      "# comment")
    val ds = spark.createDataset(hsps).flatMap(BlastToGff3.parseLine _)
    val matches = BlastToGff3.toFeatures(ds, evalueCutoff = 1.0)
    assert(matches.count() == 2)
    val top = matches.filter($"n_parts" === 2).as[
      (String, String, String, Int, Int, Int, Double, Double, Long)].collect().head
    assert(top._5 == 999 && top._6 == 1159) // fmin 0-based, fmax spans both HSPs
    val lines = BlastToGff3.toGff3Lines(matches).as[String].collect()
    // C/Perl-style %.3g: trailing mantissa zeros stripped (1e-30, not
    // Java Formatter's 1.00e-30)
    assert(lines.exists(_.contains("\t1e-30\t")))
    assert(lines.forall(_.split("\t").length == 9))
  }

  test("blast2gbrowsegff3 document: typed hit + Parent/Target/Gap parts") {
    // blast2gbrowsegff3.pm:311-366: hit typed by algorithm with
    // ID/Name; match_part with Parent + 'Target=<q> <s> <e> <strand>'
    // (numeric strand, as the reference prints) + Gap when ungapped
    val hsps = Seq(
      "q1\ts1\t98.5\t100\t1\t0\t1\t100\t1000\t1099\t1e-30\t190",
      "q1\ts1\t97.0\t80\t2\t0\t90\t170\t1080\t1159\t1e-20\t150",
      "q2\ts2\t90.0\t50\t5\t2\t1\t50\t5000\t5049\t1e-5\t80") // gapped
    val ds = spark.createDataset(hsps).flatMap(BlastToGff3.parseLine _)
    val doc = BlastToGff3.toGbrowseLines(ds, source = "blastn")
      .orderBy($"srcfeature", $"hit_fmin", $"match_id", $"rank", $"fmin")
    val lines = doc.select($"value").as[String].collect()
    assert(lines.length == 5) // 2 hits + 3 parts
    assert(lines(0) ==
      "s1\tblastn\tnucleotide_match\t1000\t1159\t1e-30\t+\t.\tID=q1:s1:1:1;Name=q1")
    assert(lines(1) ==
      "s1\tblastn\tmatch_part\t1000\t1099\t1e-30\t+\t.\tGap=M100;Parent=q1:s1:1:1;Target=q1 1 100 1")
    assert(lines(2) ==
      "s1\tblastn\tmatch_part\t1080\t1159\t1e-20\t+\t.\tGap=M80;Parent=q1:s1:1:1;Target=q1 90 170 1")
    // gapped HSP: no cigar in tabular input -> Gap honestly omitted
    assert(lines(4).contains("match_part") && !lines(4).contains("Gap=")
      && lines(4).contains("Parent=q2:s2:1:1")
      && lines(4).endsWith("Target=q2 1 50 1"))
    // --type override wins over the algorithm guess
    val typed = BlastToGff3.toGbrowseLines(ds, source = "blastn",
      primaryTag = Some("EST_match"))
    assert(typed.filter($"rank" === 0)
      .select($"value").as[String].collect().forall(_.contains("\tEST_match\t")))
  }

  test("gff3alignment filter drops groups with a distant match_part (P7)") {
    // BLAST-derived fixture: group A's two HSPs overlap (distance < 0);
    // group B's two HSPs sit 3000 bases apart on the subject — one
    // distant part dooms the whole group (gff3alignment.pm:120-126)
    val hsps = Seq(
      "q1\ts1\t98.0\t100\t1\t0\t1\t100\t1000\t1099\t1e-30\t190",
      "q1\ts1\t97.0\t80\t2\t0\t90\t170\t1080\t1159\t1e-20\t150",
      "q2\ts1\t95.0\t50\t1\t0\t1\t50\t2000\t2049\t1e-25\t90",
      "q2\ts1\t94.0\t50\t1\t0\t60\t110\t5050\t5099\t1e-22\t85")
    val ds = spark.createDataset(hsps).flatMap(BlastToGff3.parseLine _)
    val matches = BlastToGff3.toFeatures(ds).select(
      $"match_id".as("uniquename"), lit(null).cast("string").as("name"),
      lit("protein_match").as("ftype"), $"subjectId".as("srcfeature"),
      $"fmin", $"fmax", $"score".as("score"), $"strand",
      lit(null).cast("int").as("phase"), lit("blast").as("source"),
      lit(null).cast("string").as("parent"))
    val parts = BlastToGff3.toMatchParts(ds)
    // q2's HSPs do NOT chain (no overlap) -> they are separate groups of
    // one part each; force them into one group by renaming parents
    val features = matches.unionByName(parts)
    val kept = AlignmentFilter.matchPartFilter(features, maxDistance = 500)
    val keptIds = kept.select($"uniquename").as[String].collect().toSet
    // q1's group (2 overlapping parts) survives with its parts
    assert(keptIds.exists(_.startsWith("q1:s1:1:1:")))
    assert(keptIds.count(!_.contains(":1:1:")) >= 2) // match rows survive too
    // a synthetic distant pair: same parent, gap 3001 > 500
    val distant = Seq(
      ("m1", "protein_match", "s1", 2000, 5099, null.asInstanceOf[String]),
      ("m1:1", "match_part", "s1", 2000, 2049, "m1"),
      ("m1:2", "match_part", "s1", 5050, 5099, "m1"),
      ("m2", "protein_match", "s1", 0, 200, null.asInstanceOf[String]),
      ("m2:1", "match_part", "s1", 0, 100, "m2"),
      ("m2:2", "match_part", "s1", 120, 200, "m2"))
      .toDF("uniquename", "ftype", "srcfeature", "fmin", "fmax", "parent")
      .withColumn("name", lit(null).cast("string"))
      .withColumn("score", lit(null).cast("double"))
      .withColumn("strand", lit(1))
      .withColumn("phase", lit(null).cast("int"))
      .withColumn("source", lit("blast"))
    val kept2 = AlignmentFilter.matchPartFilter(distant, maxDistance = 500)
      .select($"uniquename").as[String].collect().toSet
    assert(kept2 == Set("m2", "m2:1", "m2:2")) // m1 group filtered whole
  }

  test("stock dump emits strain/inventory/plasmid TSVs (dictystrain/dictyplasmid)") {
    import graft.export.StockExport
    val strains = Seq(("DBS0000002", " axenic strain ", "discoideum", null),
      ("DBS0000001", "wildtype", "discoideum", null))
      .toDF("stock_id", "descriptor", "species", "parent_id")
    val props = Seq(
      ("DBS0000001", "description", " the canonical WT "),
      ("DBS0000001", "location", "freezer-3"),
      ("DBS0000001", "plasmid", "DBP0000007"),
      ("DBS0000002", "color", "blue"))
      .toDF("stock_id", "prop_name", "value")
    val strainTsv = StockExport.strainLines(strains, props).as[String].collect()
    assert(strainTsv.toSeq == Seq(
      "DBS0000001\twildtype\tdiscoideum\tthe canonical WT",
      "DBS0000002\taxenic strain\tdiscoideum\t"))
    val inv = StockExport.inventoryLines(props).as[String].collect()
    assert(inv.toSeq == Seq("DBS0000001\tlocation\tfreezer-3",
      "DBS0000002\tcolor\tblue")) // plasmid + description are not inventory
    val dscg = StockExport.withDscgIds(strains)
      .select($"stock_id", $"dscg_id").as[(String, String)].collect().toMap
    assert(dscg == Map("DBS0000001" -> "DSC_G0000001", "DBS0000002" -> "DSC_G0000002"))
    val plasmids = Seq(("DBP0000007", "pDM304", null.asInstanceOf[String]))
      .toDF("stock_id", "name", "description")
    assert(StockExport.plasmidLines(plasmids).as[String].collect().toSeq ==
      Seq("DBP0000007\tpDM304\t"))
    // `props` kind dumps the whole bag; `parent` resolves the self-join
    assert(StockExport.allPropLines(props).as[String].collect().length == 4)
    val withParent = Seq(("DBS0000002", "mutant", "discoideum", "DBS0000001"),
      ("DBS0000001", "wildtype", "discoideum", null))
      .toDF("stock_id", "descriptor", "species", "parent_id")
    assert(StockExport.parentLines(withParent).as[String].collect().toSeq ==
      Seq("DBS0000002\twildtype")) // root strain skipped
  }

  test("organism merge inserts only novel (genus, species) pairs") {
    import graft.etl.StockImport
    val dir = java.nio.file.Files.createTempFile("organisms", ".tsv")
    java.nio.file.Files.writeString(dir,
      "Dictyostelium\tdiscoideum\tslime mold\nPolysphondylium\tpallidum\t\n" +
        "Dictyostelium\tdiscoideum\tdup row\n")
    val staging = StockImport.organisms(spark, dir.toString)
    assert(staging.count() == 2)
    assert(staging.filter($"species" === "discoideum")
      .select($"abbreviation").as[String].head() == "D.discoideum")
    val live = Seq(("Dictyostelium", "discoideum", "existing", "D.discoideum"))
      .toDF("genus", "species", "common_name", "abbreviation")
    val (merged, inserted) = StockImport.mergeOrganisms(staging, live)
    assert(inserted == 1 && merged.count() == 2) // only pallidum is new
    val (_, again) = StockImport.mergeOrganisms(staging, merged)
    assert(again == 0) // idempotent
  }

  test("bibtex parses entries and round-trips through bib formatting") {
    import graft.sources.BibTex
    val bib =
      """@article{PMID:10557,
        |  author = {Smith, J. and Doe, A.},
        |  title = {A paper about
        |           actin},
        |  journal = {J Biol},
        |  year = 1999,
        |  volume = {12},
        |  pages = {1-10}
        |}
        |
        |@book{someKey, title = "A book", year = {2001}}
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("refs", ".bib")
    java.nio.file.Files.writeString(f, bib)
    val rows = BibTex.read(spark, f.toString).orderBy($"uniquename").collect()
    assert(rows.length == 2)
    val art = rows.find(_.getString(0) == "10557").get
    assert(art.getString(1) == "article")
    assert(art.getString(2) == "A paper about actin") // folded whitespace
    assert(art.getString(3) == "Smith, J.|Doe, A.")
    assert(art.getString(5) == "1999") // bare value
    // round-trip: formatted back out via PubExport
    val out = graft.export.PubExport.bibRecords(
      BibTex.read(spark, f.toString).filter($"entry_type" === "article"))
      .as[String].collect().head
    assert(out.contains("author = {Smith, J. and Doe, A.}"))
    assert(out.contains("title = {A paper about actin}"))
  }

  test("pubplace predicate splits chadopub2bib from dictynonpub2bib") {
    import graft.sources.BibTex
    // pubplace defaults to PUBMED; an explicit field routes the entry to
    // the non-pubmed dump (dictynonpub2bib.pm:47-56 complement predicate)
    val bib =
      """@article{PMID:1, title = {pm}, year = {1999}}
        |@article{PUB100, title = {house}, year = {2000}, pubplace = {dictyBase}}
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("places", ".bib")
    java.nio.file.Files.writeString(f, bib)
    val pubs = BibTex.read(spark, f.toString)
    assert(pubs.filter($"pubplace" === "PUBMED").count() == 1)
    val nonpub = graft.export.PubExport
      .bibRecordsKeyed(pubs.filter($"pubplace" =!= "PUBMED"))
      .select($"uniquename", $"pubplace").as[(String, String)].collect().toSeq
    assert(nonpub == Seq(("PUB100", "dictyBase")))
  }

  test("alignment export rebuilds Target from rank-1 featurelocs (W2)") {
    import graft.export.Gff3Export
    val features = Seq(("hit1", "match"), ("gene1", "gene"))
      .toDF("uniquename", "ftype")
    val locs = Seq(
      ("hit1", "chr1", 999, 1500, -1, 0), // subject location
      ("hit1", "q1", 0, 501, 1, 1), // Target (query) location
      ("gene1", "chr1", 10, 90, 1, 0)) // not an alignment: no rank-1 row
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand", "rank")
    val analysis = Seq(("hit1", 95.5)).toDF("uniquename", "rawscore")
    val lines = Gff3Export.alignmentLines(features, locs, analysis)
      .as[String].collect()
    assert(lines.length == 1)
    assert(lines.head ==
      "chr1\tchado\tmatch\t1000\t1500\t95.5\t-\t.\tID=hit1;Target=q1 1 501 +")
  }

  test("dropontofromchado removes a namespace and its edges") {
    import graft.etl.OntologyMerge
    val cvterm = Seq(("GO:1", "a", null, 0, "go"), ("GO:2", "b", null, 0, "go"),
      ("SO:1", "c", null, 0, "so"))
      .toDF("accession", "name", "definition", "is_obsolete", "namespace")
    val syn = Seq(("GO:1", "alpha"), ("SO:1", "sigma")).toDF("accession", "synonym")
    val alt = Seq(("GO:2", "GO:99")).toDF("accession", "alt_id")
    val rel = Seq(("GO:1", "is_a", "GO:2"), ("SO:1", "is_a", "GO:1"))
      .toDF("subject", "predicate", "object")
    val res = OntologyMerge.dropOntology(
      OntologyMerge.CvStore(cvterm, syn, alt, rel), "go")
    assert(res.counts == Map("dropped_terms" -> 2L, "dropped_synonyms" -> 1L,
      "dropped_alt_ids" -> 1L, "dropped_relationships" -> 2L))
    assert(res.store.cvterm.select($"accession").as[String].collect().toSeq == Seq("SO:1"))
    assert(res.store.relationship.count() == 0) // SO:1's edge touched GO:1
    assert(res.store.synonym.as[(String, String)].collect().toSeq == Seq(("SO:1", "sigma")))
  }

  test("dictypub link export and bib formatting") {
    import graft.export.PubExport
    val fp = Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 1L))
      .toDF("gene_id", "pub_id")
    val genes = Seq((10L, "aarA", 0), (11L, "abcB", 0), (12L, "gone", 1),
      (13L, "noDdb", 0)).toDF("gene_id", "name", "is_deleted")
    val pubs = Seq((1L, "10557", "PUBMED"), (2L, "PUB99", "PUBMED"),
      (3L, "20991", "PUBMED")).toDF("pub_id", "uniquename", "pubplace")
    val ddb = Seq((10L, "DDB_G1")).toDF("gene_id", "ddb_id")
    val lines = PubExport.genePubLinks(fp, genes, pubs, ddb).as[String].collect()
    // abcB: PUB-prefixed pub rejected; gone: deleted; noDdb: no translation
    assert(lines.toSeq == Seq("10557\taarA\tDDB_G1"))
    val bib = PubExport.bibRecords(Seq(
      ("10557", "A paper", "Smith, J.|Doe, A.", "J Biol", "1999", "12", "1-10"))
      .toDF("uniquename", "title", "authors", "journal", "year", "volume", "pages"))
      .as[String].collect().head
    assert(bib.startsWith("@article{PMID:10557,"))
    assert(bib.contains("author = {Smith, J. and Doe, A.}"))
    assert(bib.contains("pages = {1-10}"))
  }

  test("stock import validates ids and stitches parents (S8/J11)") {
    val dir = java.nio.file.Files.createTempDirectory("stock")
    java.nio.file.Files.writeString(dir.resolve("strain.tsv"),
      "DBS0000001\taxeA mutant\tD. discoideum\t\n" +
        "DBS0000002\taxeB mutant\tD. discoideum\tDBS0000001\n" +
        "BADID12345\tnope\tx\t\n")
    val strains = StockImport.strains(spark, dir.resolve("strain.tsv").toString)
    assert(strains.count() == 2) // regex gate dropped BADID
    val withP = StockImport.withParents(strains)
    val child = withP.filter($"stock_id" === "DBS0000002")
      .select($"parent_descriptor").as[String].collect()
    assert(child.toSeq == Seq("axeA mutant"))
  }

  test("GenBank scanner parses locus, features, qualifiers, origin (S6)") {
    val gb =
      """LOCUS       TESTSEQ    60 bp    DNA     linear   PLN 01-JAN-2024
        |DEFINITION  test record.
        |FEATURES             Location/Qualifiers
        |     source          1..60
        |                     /organism="Dictyostelium discoideum"
        |     gene            10..50
        |                     /gene="abcA"
        |     CDS             join(10..30,40..50)
        |                     /gene="abcA"
        |                     /product="ABC transporter
        |                     family protein"
        |ORIGIN
        |        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
        |//
        |""".stripMargin
    val rec = GenBank.parseRecord(gb).get
    assert(rec.locus == "TESTSEQ" && rec.length == 60)
    assert(rec.sequence.length == 60 && rec.sequence.startsWith("ACGTACGTAC"))
    val cds = rec.features.find(_.key == "CDS").get
    assert(cds.location == "join(10..30,40..50)")
    assert(cds.qualifiers("product") == "ABC transporterfamily protein")
    assert(rec.features.find(_.key == "gene").get.qualifiers("gene") == "abcA")
  }

  test("intron stats from exon gaps via lag window (A4)") {
    val gff =
      """##gff-version 3
        |chr1	t	mRNA	1	1000	.	+	.	ID=rna1
        |chr1	t	exon	1	100	.	+	.	Parent=rna1
        |chr1	t	exon	201	400	.	+	.	Parent=rna1
        |chr1	t	exon	501	1000	.	+	.	Parent=rna1
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("introns", ".gff3")
    java.nio.file.Files.writeString(f, gff)
    val feats = Gff3.features(spark, f.toString)
    val introns = SumStats.introns(feats)
      .select($"intron_len").as[Int].collect().sorted
    assert(introns.toSeq == Seq(100, 100)) // gaps 100..200 and 400..500
    val stats = SumStats.intronStats(feats).collect().head
    assert(stats.getLong(0) == 2 && stats.getDouble(1) == 100.0)
  }

  test("malformed GFF3 rows are counted via accumulator (A8)") {
    val f = java.nio.file.Files.createTempFile("bad", ".gff3")
    java.nio.file.Files.writeString(f,
      "chr1\tt\tgene\t1\t100\t.\t+\t.\tID=ok\n" +
        "chr1\tt\tgene\tBAD\t100\t.\t+\t.\tID=bad\n")
    val acc = spark.sparkContext.longAccumulator("badRows")
    val n = Gff3.features(spark, f.toString, Some(acc)).count()
    assert(n == 1 && acc.value == 1)
  }

  test("JDBC store round-trips through embedded Derby with pushdown (K1-K3/S9)") {
    val url = s"jdbc:derby:memory:graftdb;create=true"
    val df = Seq((1L, "gene1", "gene"), (2L, "rna1", "mRNA"))
      .toDF("feature_id", "uniquename", "ftype")
    JdbcStore.write(df, url, "feature", mode = "overwrite",
      columnTypes = Some("uniquename VARCHAR(128), ftype VARCHAR(64)"))
    val back = JdbcStore.read(spark, url, "feature")
      .filter($"ftype" === "gene") // pushes down into Derby
      .select($"uniquename").as[String].collect()
    assert(back.toSeq == Seq("gene1"))
    // driver-side transactional merge (the reference's txn guard): a
    // failing statement rolls the whole batch back
    val counts = JdbcStore.mergeTransaction(url, Seq(
      "INSERT INTO feature VALUES (3, 'new1', 'exon')"))
    assert(counts == Seq(1))
    intercept[java.sql.SQLException] {
      JdbcStore.mergeTransaction(url, Seq(
        "INSERT INTO feature VALUES (4, 'new2', 'exon')",
        "INSERT INTO no_such_table VALUES (1)"))
    }
    val n = JdbcStore.read(spark, url, "feature").count()
    assert(n == 3) // the failed txn left nothing behind
  }

  test("html to wiki conversion (F14)") {
    import graft.functions.WikiText
    val got = WikiText.htmlToWiki(
      "<p>The <b>abcA</b> gene encodes an <i>ABC</i> " +
        "<a href=\"http://x.org/p1\">transporter</a>.<br/>Second line.</p>")
    assert(got == "The '''abcA''' gene encodes an ''ABC'' " +
      "[http://x.org/p1 transporter].\nSecond line.")
    val viaUdf = Seq("<b>x</b>").toDF("h")
      .select(WikiText.html_to_wiki($"h").as("w")).as[String].collect().head
    assert(viaUdf == "'''x'''")
  }
}
