package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GenomicFunctions

/** chado2fasta from the relational store
  * (lib/Modware/Export/Command/chado2fasta.pm:359-460), set-based: the
  * reference runs one `SUBSTR(srcfeature.residues, ...)` query per
  * feature (and per exon for spliced transcripts) — here each mode is a
  * single join + projection over (feature, featureloc, reference
  * residues), with the exon concatenation as an ordered aggregation
  * (O2: `sort_array(collect_list(struct))`, see also the typed
  * [[graft.functions.OrderedAssembly]] alternative).
  *
  * All modes share the column contracts:
  *  - `locs`: (uniquename, srcfeature, fmin, fmax, strand) — rank-0
  *    featureloc rows of the features to dump;
  *  - `refs`: (srcfeature, residues) — reference sequences (store
  *    residues or the GFF3 `##FASTA` tail).
  *
  * Scale: `refs` carries whole-chromosome strings; the join key is
  * srcfeature so one reference row meets each of its features once —
  * Spark broadcasts refs when small, else it's a standard shuffled
  * equi-join partitioned by chromosome (the reference's own per-
  * chromosome process pool, as a partitioning).
  */
object FastaExport {

  private def revIfMinus(strand: Column, seq: Column): Column =
    when(strand === -1, GenomicFunctions.reverseComplement(seq)).otherwise(seq)

  /** `infer_and_dump_sequence` (chado2fasta.pm:381-415): per-feature
    * sequence = SUBSTR of its reference span, reverse-complemented on
    * the minus strand. Output: (uniquename, residues). */
  def inferred(locs: DataFrame, refs: DataFrame): DataFrame =
    locs.join(refs, Seq("srcfeature"))
      .select(col("uniquename"),
        revIfMinus(col("strand"),
          expr("substring(residues, fmin + 1, fmax - fmin)")).as("residues"))

  /** `dump_cds_sequence` (chado2fasta.pm:432-460): spliced sequence per
    * transcript — its exons' spans cut from the reference, concatenated
    * in fmin order, then reverse-complemented if the transcript is on
    * the minus strand (the revcomp applies to the ASSEMBLED sequence,
    * exactly like the reference).
    *
    * `exonParents`: (exon uniquename, parent transcript uniquename) —
    * the `part_of` feature_relationship rows restricted to exons.
    * Output: (uniquename, residues) keyed by transcript.
    */
  def spliced(transcriptLocs: DataFrame, exonParents: DataFrame,
              exonLocs: DataFrame, refs: DataFrame): DataFrame = {
    val pieces = exonLocs
      .join(exonParents.select(col("uniquename"), col("parent")), Seq("uniquename"))
      .join(refs, Seq("srcfeature"))
      .select(col("parent"),
        col("fmin"),
        expr("substring(residues, fmin + 1, fmax - fmin)").as("piece"))
    val assembled = pieces
      .groupBy(col("parent"))
      .agg(concat_ws("", expr(
        "transform(sort_array(collect_list(struct(fmin, piece))), x -> x.piece)"))
        .as("seq"))
    transcriptLocs
      .join(assembled, transcriptLocs("uniquename") === assembled("parent"))
      .select(col("uniquename"),
        revIfMinus(col("strand"), col("seq")).as("residues"))
  }

  /** `dump_polypeptide_sequence` (chado2fasta.pm:417-430): polypeptides
    * located via `derives_from` from their transcript; sequence comes
    * from the polypeptide's own residues when present, else inferred
    * from its span. `derives`: (subject polypeptide, object transcript).
    */
  def polypeptides(polyLocs: DataFrame, derives: DataFrame, refs: DataFrame): DataFrame =
    inferred(
      polyLocs.join(derives.select(col("subject").as("uniquename")), Seq("uniquename"), "left_semi"),
      refs)
}
