package graft.etl

import org.apache.spark.sql.Dataset
import graft.chado.GffRecord
import graft.sources.GenBank.{GbFeature, GbRecord}

/** gb2chado / gbassembly2chado (SURVEY.md §2.1 S6): GenBank records →
  * Chado staging → the standard merge DAG, mirroring
  * lib/Modware/Load/Command/gb2chado.pm +
  * lib/Modware/Loader/Genome/GenBank.pm:384-531.
  *
  * The reference walks each scaffold's feature table sequentially,
  * grouping a `gene` with the `*RNA` / `CDS` entries that follow it
  * (FeatureStack). That grouping is inherently per-scaffold sequential —
  * so it runs inside a `flatMap` over records: scaffolds parallelize
  * across the cluster, the within-scaffold walk stays a tight local loop
  * (the same shape as the reference, minus its one-process limit).
  * Everything after — staging fan-out, anti-join novelty, FK stitch —
  * reuses [[Gff3ToChado]]'s set-based merge.
  */
object GenBankToChado {

  /** Parse a GenBank location string into (fmin 0-based interbase, fmax,
    * strand): handles `complement(...)`, `join(a..b,c..d)`, `order(...)`,
    * partial markers `<`/`>`, and single-point `123` locations
    * (the Bio::SeqIO surface the reference consumes). */
  def parseLocation(loc: String): Option[(Int, Int, Int)] = {
    val strand = if (loc.contains("complement")) -1 else 1
    val spans = "([0-9]+)(?:\\.\\.[<>]?([0-9]+))?".r
      .findAllMatchIn(loc.replaceAll("[<>]", "")).toSeq
    if (spans.isEmpty) None
    else {
      val starts = spans.map(_.group(1).toInt)
      val ends = spans.map(m => Option(m.group(2)).map(_.toInt).getOrElse(m.group(1).toInt))
      Some((starts.min - 1, ends.max, strand))
    }
  }

  private def name(f: GbFeature, fallback: String): String =
    f.qualifiers.get("gene").orElse(f.qualifiers.get("locus_tag")).getOrElse(fallback)

  /** One scaffold's GFF3-shaped rows: the scaffold feature itself plus
    * gene/transcript/CDS rows grouped FeatureStack-style
    * (GenBank.pm:458-531). `mitochondrial = true` follows
    * load_mitochondrial_features: each CDS also synthesizes an mRNA
    * transcript carrying the gene's strand (GenBank.pm:497-531), and the
    * scaffold is flagged `mitochondrial_DNA` instead of
    * `nuclear_sequence` (GenBank.pm:425-433, the P9 partition flag).
    */
  def recordToGff(rec: GbRecord, mitochondrial: Boolean): Seq[GffRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[GffRecord]
    val genomeProp = if (mitochondrial) "mitochondrial_DNA" else "nuclear_sequence"
    // source 'GenBank' (capitalized) everywhere: the staged GFF_source
    // dbxref must be case-consistent with the assembly loader's compat
    // xref so per-source export filters see ONE provenance value
    out += GffRecord(rec.locus, Some("GenBank"), "chromosome", 0,
      math.max(rec.length, rec.sequence.length), None, None, None,
      Map("ID" -> Seq(rec.locus), "genome_type" -> Seq(genomeProp)))

    var geneId: String = null
    var geneStrand = 1
    var lastTranscript: String = null
    var idx = 0
    for (f <- rec.features) {
      idx += 1
      val locParsed = parseLocation(f.location)
      f.key match {
        case "gene" =>
          locParsed.foreach { case (fmin, fmax, strand) =>
            geneId = s"${rec.locus}:${name(f, s"gene$idx")}"
            geneStrand = strand
            lastTranscript = null
            out += GffRecord(rec.locus, Some("GenBank"), "gene", fmin, fmax,
              None, Some(strand), None,
              Map("ID" -> Seq(geneId), "Name" -> Seq(name(f, s"gene$idx"))))
          }
        case k if k.endsWith("RNA") && geneId != null =>
          locParsed.foreach { case (fmin, fmax, strand) =>
            lastTranscript = s"$geneId:$k:$idx"
            out += GffRecord(rec.locus, Some("GenBank"), k, fmin, fmax,
              None, Some(strand), None,
              Map("ID" -> Seq(lastTranscript), "Parent" -> Seq(geneId)))
          }
        case "CDS" if geneId != null =>
          locParsed.foreach { case (fmin, fmax, strand) =>
            if (mitochondrial) {
              // mito records carry no explicit mRNA: clone the CDS as a
              // transcript on the gene's strand (GenBank.pm:510-517)
              lastTranscript = s"$geneId:mRNA:$idx"
              out += GffRecord(rec.locus, Some("GenBank"), "mRNA", fmin, fmax,
                None, Some(geneStrand), None,
                Map("ID" -> Seq(lastTranscript), "Parent" -> Seq(geneId)))
            }
            val parent = Option(lastTranscript).getOrElse(geneId)
            out += GffRecord(rec.locus, Some("GenBank"), "CDS", fmin, fmax,
              None, Some(strand), Some(0),
              Map("ID" -> Seq(s"$geneId:cds:$idx"),
                "Derives_from" -> Seq(parent),
                "Parent" -> Seq(parent)) ++
                f.qualifiers.get("protein_id").map(p => "protein_id" -> Seq(p)))
          }
        case _ => // source/misc features are not loaded by the reference
      }
    }
    out.toSeq
  }

  /** GenBank records → GFF3-shaped rows ready for [[Gff3ToChado.stage]]. */
  def toGffRecords(records: Dataset[GbRecord],
                   mitochondrial: Boolean = false): Dataset[GffRecord] = {
    import records.sparkSession.implicits._
    records.flatMap(recordToGff(_, mitochondrial))
  }
}
