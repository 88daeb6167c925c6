package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GAF 2.0 export pipeline — the reference's flagship product export
  * (`lib/Modware/Export/GAF.pm:155-386` + the dictyBase specialization
  * `lib/Modware/Export/Command/dictygaf.pm:118-146`), re-expressed as one
  * declarative DataFrame plan instead of a per-annotation ORM walk.
  *
  * Composes, set-based:
  *  - P2 obsolete-term filter (`GAF.pm:193-206`): `is_obsolete = 0`
  *    unless `includeObsolete`;
  *  - P3 aspect namespace filter (`GAF.pm:195-200`): cv in
  *    molecular_function / biological_process / cellular_component;
  *  - P6 skip-id filter (`GAF.pm:137-153,234-236`): broadcast anti-join
  *    against the skip list instead of a per-row hash probe;
  *  - F17 aspect abbreviation map (`GAF.pm:169-180`);
  *  - F18 evidence-code synonym resolution (`GAF.pm:273-281`): of an
  *    evidence term's synonyms, a short (≤3-char) synonym is preferred —
  *    the reference keeps the last short one in undefined resultset
  *    order, we take the lexicographic MIN for determinism;
  *  - A6 latest-by-date gene description (`dictygaf.pm:118-146`): legacy
  *    `%d-%b-%y` dates, keep the newest product row per gene;
  *  - A7 pipe-folds (`GAF.pm:352-364,370-386`): synonyms and xrefs
  *    collapsed to `a|b|c` (sorted — the reference emits resultset order);
  *  - K6 serialization (`GAF.pm:155-167,347-350`): dated `!` header +
  *    numeric-key column order.
  *
  * Scale notes: annotations are the fact table; term/evidence/skip frames
  * are dimensions and broadcast. Gene-level folds (synonyms,
  * descriptions) are aggregated BEFORE the join so the fact table is
  * touched once, with map-side partial aggregation — no N+1, no window
  * over the fact table.
  */
object GafExport {

  /** F17 — aspect cv name → single-letter GAF aspect (`GAF.pm:169-180`). */
  val aspects: Seq[(String, String)] = Seq(
    "molecular_function" -> "F",
    "biological_process" -> "P",
    "cellular_component" -> "C")

  private def aspectCol(cvName: org.apache.spark.sql.Column) = {
    val m = map(aspects.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    element_at(m, cvName)
  }

  /** F18 — per evidence term, resolve the preferred display synonym:
    * short (≤3 chars, the GAF evidence code like IDA/IEA) wins over the
    * spelled-out form; deterministic lexicographic pick inside each
    * length class (`GAF.pm:273-281`, IdStash.pm:144-167).
    *
    * `evidenceSynonyms`: (evidence_id, synonym). Returns one row per
    * evidence_id with `evidence_code`.
    */
  def resolveEvidence(evidenceSynonyms: DataFrame): DataFrame =
    evidenceSynonyms
      .groupBy(col("evidence_id"))
      .agg(coalesce(
        min(when(length(col("synonym")) <= 3, col("synonym"))),
        min(col("synonym"))).as("evidence_code"))

  /** A6 — latest-by-date description (`dictygaf.pm:118-146`): one row per
    * gene_id keeping the product with the max `%d-%b-%y` date_created;
    * ties broken by description for determinism.
    *
    * `descriptions`: (gene_id, description, date_created "dd-MMM-yy").
    */
  def latestDescription(descriptions: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("gene_id"))
      .orderBy(graft.functions.GenomicFunctions.legacyDate(col("date_created")).desc,
        col("description"))
    descriptions
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("gene_id"), col("description"))
  }

  /** Input column contracts (Chado-shaped frames; see callers):
    *
    *  - `assoc` (fact): feature_cvterm rows —
    *    (gene_id, go_id, pub, evidence_id, qualifier, with_from, date,
    *    assigned_by); qualifier/with/date/assigned_by are the
    *    feature_cvtermprop payload already pivoted onto the row (the
    *    loader writes them rank-aligned, `GAF.pm:86-163`).
    *  - `terms` (dim): (go_id, cv_name, is_obsolete 0/1).
    *  - `genes` (dim): (gene_id, accession, symbol, object_type).
    *  - `evidenceSynonyms` (dim): (evidence_id, synonym) — F18 input.
    *  - `geneSynonyms`: (gene_id, name) — folded per gene (A7).
    *  - `descriptions`: (gene_id, description, date_created) — A6 input.
    *  - `skipIds`: Option[(accession)] — P6.
    *
    * Output: the 17 GAF 2.0 columns `c1..c17` in spec order
    * (db, accession, symbol, qualifier, go_id, db_ref, evidence_code,
    * with_from, aspect, object_name, synonyms, object_type, taxon, date,
    * assigned_by, annotation_extension, gene_product_form_id).
    */
  def rows(
      assoc: DataFrame,
      terms: DataFrame,
      genes: DataFrame,
      evidenceSynonyms: DataFrame,
      geneSynonyms: DataFrame,
      descriptions: DataFrame,
      skipIds: Option[DataFrame] = None,
      sourceDb: String = "dictyBase",
      goNamespace: String = "GO",
      taxon: String = "taxon:44689",
      includeObsolete: Boolean = false): DataFrame = {

    // P2 + P3 + F17 on the term dimension (filter the dim BEFORE the
    // fact join — the inner join then prunes the fact rows for free)
    val keptTerms = {
      val base = terms.filter(col("cv_name").isin(aspects.map(_._1): _*))
      val t = if (includeObsolete) base else base.filter(col("is_obsolete") === 0)
      t.select(col("go_id"), aspectCol(col("cv_name")).as("aspect"))
    }

    // P6 — skip-list anti-join on the gene dimension
    val keptGenes = skipIds match {
      case Some(skip) =>
        genes.join(broadcast(skip), genes("accession") === skip("accession"), "left_anti")
      case None => genes
    }

    // A7 — gene-level pipe-folds, aggregated pre-join (one pass, map-side
    // partial agg; the reference walks feature_synonyms per row)
    val synFold = geneSynonyms
      .groupBy(col("gene_id"))
      .agg(concat_ws("|", sort_array(collect_list(col("name")))).as("synonyms"))

    val desc = latestDescription(descriptions)
    val evidence = resolveEvidence(evidenceSynonyms)

    assoc
      .join(broadcast(keptTerms), Seq("go_id"))
      .join(keptGenes, Seq("gene_id"))
      .join(broadcast(evidence), Seq("evidence_id"))
      .join(synFold, Seq("gene_id"), "left_outer")
      .join(desc, Seq("gene_id"), "left_outer")
      .select(
        lit(sourceDb).as("c1_db"),
        col("accession").as("c2_accession"),
        col("symbol").as("c3_symbol"),
        coalesce(col("qualifier"), lit("")).as("c4_qualifier"),
        concat(lit(goNamespace + ":"), col("go_id")).as("c5_go_id"),
        col("pub").as("c6_db_ref"),
        col("evidence_code").as("c7_evidence"),
        // With:Not_supplied is emitted as empty (`GAF.pm:283-293`)
        when(col("with_from") === "With:Not_supplied", lit(""))
          .otherwise(coalesce(col("with_from"), lit(""))).as("c8_with"),
        col("aspect").as("c9_aspect"),
        coalesce(col("description"), lit("")).as("c10_name"),
        coalesce(col("synonyms"), lit("")).as("c11_synonyms"),
        col("object_type").as("c12_type"),
        lit(taxon).as("c13_taxon"),
        col("date").as("c14_date"),
        col("assigned_by").as("c15_assigned_by"),
        lit("").as("c16_extension"),
        lit("").as("c17_form_id"))
  }

  /** K6 — serialize to GAF 2.0 text lines: `!` header (gaf-version +
    * mm/dd/yyyy date + source line, `GAF.pm:155-167`) then tab-joined
    * rows ordered by (accession, go, ref) for a deterministic file.
    */
  def lines(rows: DataFrame, sourceDb: String, sourceUrl: String,
      today: java.time.LocalDate): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val d = today.format(java.time.format.DateTimeFormatter.ofPattern("MM/dd/yyyy"))
    val header = Seq(
      (0, "!gaf-version: 2.0"),
      (1, s"!$d"),
      (2, s"!$sourceDb($sourceUrl)")).toDF("ord", "value")
    val body = rows
      .select(lit(3).as("ord"),
        concat_ws("\t", rows.columns.map(col).toIndexedSeq: _*).as("value"))
    header.unionByName(body).orderBy(col("ord"), col("value")).select(col("value"))
  }

  /** Write the export. Default layout is per-aspect partitioned
    * (`aspect=F|P|C`), each directory a self-contained valid GAF with
    * its own dated header — the layout that parallelizes at corpus
    * scale (no single-partition sort; GO itself publishes per-aspect
    * slices). `singleFile` opts into the reference's one-file form. */
  def writeDocument(rows: DataFrame, sourceDb: String, sourceUrl: String,
      today: java.time.LocalDate, out: String,
      singleFile: Boolean = false): Unit =
    if (singleFile) {
      lines(rows, sourceDb, sourceUrl, today)
        .coalesce(1).write.mode("overwrite").text(out)
    } else {
      val spark = rows.sparkSession
      import spark.implicits._
      val d = today.format(java.time.format.DateTimeFormatter.ofPattern("MM/dd/yyyy"))
      val hdr = rows.select(col("c9_aspect").as("aspect")).distinct()
        .crossJoin(Seq(
          (0, "!gaf-version: 2.0"),
          (1, s"!$d"),
          (2, s"!$sourceDb($sourceUrl)")).toDF("ord", "value"))
      val body = rows.select(col("c9_aspect").as("aspect"), lit(3).as("ord"),
        concat_ws("\t", rows.columns.map(col).toIndexedSeq: _*).as("value"))
      hdr.unionByName(body)
        .repartition(col("aspect"))
        .sortWithinPartitions(col("aspect"), col("ord"), col("value"))
        .select(col("aspect"), col("value"))
        .write.mode("overwrite").partitionBy("aspect").text(out)
    }
}
