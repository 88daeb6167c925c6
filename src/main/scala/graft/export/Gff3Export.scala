package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** chado2canonicalgff3, Spark-first (SURVEY.md §3.3): the reference
  * walks organism → reference → gene → transcript → exon/CDS with one
  * SQL round-trip per parent row (N+1, EventEmitter/Feature/Chado/
  * Canonical.pm:75-185) and parallelizes per-chromosome with a bash job
  * pool. Here the whole hierarchy is one set-based join pass and the
  * output order is a single sort — per-reference partitioning replaces
  * the process pool.
  *
  * Order-sensitive output (SURVEY.md §7 risk 3) is handled with explicit
  * sort keys carried to the final write — never partition concatenation
  * order, which coalescing writers do not preserve.
  */
object Gff3Export {

  /** Rank features for parent-before-child emission within a reference. */
  private val typeRank = typedlit(Map(
    "chromosome" -> 0, "contig" -> 1, "supercontig" -> 1, "gene" -> 2,
    "mRNA" -> 3, "tRNA" -> 3, "rRNA" -> 3, "ncRNA" -> 3, "pseudogene" -> 3,
    "exon" -> 4, "CDS" -> 5, "polypeptide" -> 6,
    "match" -> 7, "protein_match" -> 7, "EST_match" -> 7, "cDNA_match" -> 7,
    "translated_nucleotide_match" -> 7, "match_part" -> 8))

  private def esc(c: org.apache.spark.sql.Column) =
    // GFF3 reserved-character escaping for column 9 values; comma must
    // be escaped too — it separates multiple values of one attribute
    // (load-bearing since Alias lists joined with ',')
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      "%", "%25"), ";", "%3B"), "=", "%3D"), ",", "%2C")

  /** Feature lines with their ordering columns attached:
    * (srcfeature, type_rank, fmin, uniquename, value).
    *
    * Input columns: uniquename, name, ftype, srcfeature, fmin, fmax,
    * score (nullable double), strand (nullable int), phase (nullable
    * int), source (nullable), parent (nullable).
    */
  private def featureLines(features: DataFrame): DataFrame = {
    // optional Alias attribute (array<string> `alias` column): the dicty
    // gene rows carry their synonyms (Canonical/Dicty.pm write_gene Alias)
    val aliasAttr =
      if (!features.columns.contains("alias")) lit("")
      else when(col("alias").isNotNull && size(col("alias")) > 0,
        concat(lit(";Alias="),
          concat_ws(",", transform(col("alias"), a => esc(a)))))
        .otherwise(lit(""))
    // optional Derives_from (polypeptide rows in the dicty dumps carry
    // it instead of Parent — write_polypeptide, Canonical/Dicty.pm:150)
    val derivesAttr =
      if (!features.columns.contains("derives_from")) lit("")
      else when(col("derives_from").isNotNull,
        concat(lit(";Derives_from="), esc(col("derives_from"))))
        .otherwise(lit(""))
    val attrs = concat(
      lit("ID="), esc(col("uniquename")),
      when(col("name").isNotNull, concat(lit(";Name="), esc(col("name")))).otherwise(lit("")),
      when(col("parent").isNotNull, concat(lit(";Parent="), esc(col("parent")))).otherwise(lit("")),
      derivesAttr,
      aliasAttr)
    val line = concat_ws("\t",
      col("srcfeature"),
      coalesce(col("source"), lit(".")),
      col("ftype"),
      (col("fmin") + 1).cast("string"), // 0-based interbase -> 1-based (F8)
      col("fmax").cast("string"),
      // F10: sprintf("%.3g", score) like blast2chadogff3.pm:293
      when(col("score").isNotNull, graft.functions.GenomicFunctions.formatG3(col("score"))).otherwise("."),
      when(col("strand") === 1, "+").when(col("strand") === -1, "-").otherwise("."), // F7
      coalesce(col("phase").cast("string"), lit(".")),
      attrs)
    // a caller-supplied type_rank wins: the dicty variants re-rank their
    // rewritten pseudogene rows (gene-level `pseudogene` sorts as a gene,
    // not as the transcript the name ranks by default)
    val ranked =
      if (features.columns.contains("type_rank")) features
      else features.withColumn("type_rank",
        coalesce(typeRank(col("ftype")), lit(9)))
    ranked.select(col("srcfeature"), col("type_rank"), col("fmin"),
      col("uniquename"), line.as("value"))
  }

  /** Serialize a feature frame into ordered GFF3 lines: parent before
    * child (type rank), then fmin, within each reference. */
  def toGff3Lines(features: DataFrame): DataFrame =
    featureLines(features)
      .orderBy(col("srcfeature"), col("type_rank"), col("fmin"), col("uniquename"))
      .select(col("value"))

  /** `##gff-version` + `##sequence-region` pragmas from reference spans
    * (FeatureWriter/GFF3.pm:16-39). */
  def pragmas(references: DataFrame): DataFrame = {
    val regions = references
      .select(lit(1).as("prag_rank"),
        concat(lit("##sequence-region "), col("uniquename"), lit(" 1 "),
          col("seqlen").cast("string")).as("value"))
    val version = regions.sparkSession.range(1)
      .select(lit(0).as("prag_rank"), lit("##gff-version 3").as("value"))
    version.unionByName(regions)
      .orderBy(col("prag_rank"), col("value"))
      .select(col("value"))
  }

  /** Write the export per-reference: each `srcfeature=<ref>/` directory
    * holds a self-contained GFF3 (its own `##gff-version` +
    * `##sequence-region` pragmas + its features in canonical order) —
    * the reference's per-chromosome parallel dump shape
    * (bin/chado2dicty_gff3_parallel.sh:24-41), which is also the only
    * shape that survives 100× scale: no global sort into one partition,
    * every reference written concurrently. `singleFile = true` opts into
    * the old one-file globally-sorted output for small exports.
    *
    * All rows of one reference hash to one task (`repartition(srcfeature)`)
    * and are sorted within it, so each partition file is internally
    * ordered and files concatenate in srcfeature order to a canonical
    * whole-genome dump.
    */
  def writeDocument(references: DataFrame, features: DataFrame, out: String,
      singleFile: Boolean = false, sequenceRegion: Boolean = true): Unit =
    if (singleFile) {
      document(references, features, sequenceRegion)
        .coalesce(1).write.mode("overwrite").text(out)
    } else {
      def pragma(rank: Int, value: org.apache.spark.sql.Column) =
        references.select(col("uniquename").as("srcfeature"),
          lit(rank).as("doc_rank"), lit(0).as("type_rank"), lit(0).as("fmin"),
          lit("").as("uniquename"), value.as("value"))
      val version = pragma(0, lit("##gff-version 3"))
      // the noncanonical dicty dumps default sequence-region headers off
      // (chado2dictynoncanonicalgff3.pm write_sequence_region)
      val head =
        if (sequenceRegion)
          pragma(1, concat(lit("##sequence-region "), col("uniquename"),
            lit(" 1 "), col("seqlen").cast("string")))
        else pragma(1, lit("")).limit(0)
      val body = featureLines(features).withColumn("doc_rank", lit(2))
        .select(col("srcfeature"), col("doc_rank"), col("type_rank"),
          col("fmin"), col("uniquename"), col("value"))
      version.unionByName(head).unionByName(body)
        .repartition(col("srcfeature"))
        .sortWithinPartitions(col("srcfeature"), col("doc_rank"),
          col("type_rank"), col("fmin"), col("uniquename"))
        .select(col("srcfeature"), col("value"))
        .write.mode("overwrite").partitionBy("srcfeature").text(out)
    }

  /** Generic per-key ordered text write for frames carrying a `value`
    * column (K4/K7 sinks): one file per key, rows sorted within by
    * `sortCols` (default: the line text). */
  def writePartitionedText(df: DataFrame, partCol: String, out: String,
      sortCols: org.apache.spark.sql.Column*): Unit = {
    val order =
      if (sortCols.isEmpty) Seq(col(partCol), col("value"))
      else col(partCol) +: sortCols
    df.repartition(col(partCol))
      .sortWithinPartitions(order: _*)
      .select(col(partCol), col("value"))
      .write.mode("overwrite").partitionBy(partCol).text(out)
  }

  /** Feature lines with their ordering keys exposed —
    * (srcfeature, type_rank, fmin, uniquename, value) — for callers
    * composing partitioned writes of line subsets (e.g. the alignment
    * filter's match/match_part output). */
  def linesWithKeys(features: DataFrame): DataFrame = featureLines(features)

  /** chado2alignmentgff3 (lib/Modware/Export/Command/
    * chado2alignmentgff3.pm): re-emit alignment features with their
    * `Target` attribute reconstructed from the rank-1 featureloc (W2:
    * rank 0 = subject location, rank 1 = query location) and the score
    * from analysisfeature. Only features that carry a rank-1 location
    * are alignments — one semi-join scopes the export.
    *
    * `featureloc`: (uniquename, srcfeature, fmin, fmax, strand, rank);
    * `features`: (uniquename, ftype, source?); `analysis`:
    * (uniquename, rawscore). Returns ordered GFF3 `value` lines.
    */
  def alignmentLines(features: DataFrame, featureloc: DataFrame,
      analysis: DataFrame): DataFrame =
    alignmentLinesKeyed(features, featureloc, analysis)
      .orderBy(col("value")).select(col("value"))

  /** Alignment lines with their reference key exposed, for the
    * partitioned per-reference write (the scale default — a whole-genome
    * alignment dump is fact-sized). */
  def alignmentLinesKeyed(features: DataFrame, featureloc: DataFrame,
      analysis: DataFrame): DataFrame = {
    val loc0 = featureloc.filter(col("rank") === 0)
    val target = featureloc.filter(col("rank") === 1)
      .select(col("uniquename"),
        concat_ws(" ", col("srcfeature"), (col("fmin") + 1).cast("string"),
          col("fmax").cast("string"),
          when(col("strand") === 1, "+").when(col("strand") === -1, "-"))
          .as("target"))
    loc0
      .join(target, Seq("uniquename")) // inner join scopes to alignments
      .join(features.select(col("uniquename"), col("ftype")), Seq("uniquename"))
      .join(analysis.select(col("uniquename"), col("rawscore")),
        Seq("uniquename"), "left_outer")
      .select(col("srcfeature"), concat_ws("\t",
        col("srcfeature"), lit("chado"), col("ftype"),
        (col("fmin") + 1).cast("string"), col("fmax").cast("string"),
        when(col("rawscore").isNotNull,
          graft.functions.GenomicFunctions.formatG3(col("rawscore"))).otherwise("."),
        when(col("strand") === 1, "+").when(col("strand") === -1, "-").otherwise("."),
        lit("."),
        concat(lit("ID="), esc(col("uniquename")),
          lit(";Target="), col("target"))).as("value"))
  }

  /** Whole GFF3 document — pragmas then ordered feature lines — as one
    * globally sorted frame safe for a single-file write. */
  def document(references: DataFrame, features: DataFrame,
      sequenceRegion: Boolean = true): DataFrame = {
    val regions = references
      .select(concat(lit("##sequence-region "), col("uniquename"), lit(" 1 "),
        col("seqlen").cast("string")).as("value"))
      .withColumn("doc_rank", lit(1))
      .withColumn("srcfeature", lit(""))
      .withColumn("type_rank", lit(0)).withColumn("fmin", lit(0))
      .withColumn("uniquename", col("value"))
    val head = if (sequenceRegion) regions else regions.limit(0)
    val version = features.sparkSession.range(1)
      .select(lit("##gff-version 3").as("value"), lit(0).as("doc_rank"),
        lit("").as("srcfeature"), lit(0).as("type_rank"), lit(0).as("fmin"),
        lit("").as("uniquename"))
    val body = featureLines(features).withColumn("doc_rank", lit(2))
    version.unionByName(head).unionByName(body)
      .orderBy(col("doc_rank"), col("srcfeature"), col("type_rank"),
        col("fmin"), col("uniquename"))
      .select(col("value"))
  }
}
