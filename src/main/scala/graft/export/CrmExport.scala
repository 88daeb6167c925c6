package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The legacy dictyBase CRM / stock-center dumps — the last four
  * reference commands (SURVEY.md §2.2 K7 + §2.4 J12 composition):
  *
  *  - colleague (lib/Modware/Export/Command/colleague.pm:124-202):
  *    the colleague CSV (email-deduped) + the group-leader→member
  *    relations CSV;
  *  - colleague2gene (lib/Modware/Export/Command/colleague2gene.pm:
  *    44-68): one CSV row per colleague email with every associated
  *    gene id;
  *  - curatornotes (lib/Modware/Export/Command/curatornotes.pm:63-104):
  *    one CSV row per gene accession with its public/private curator
  *    notes;
  *  - dscorders (lib/Modware/Export/Command/dscorders.pm:104-141):
  *    plasmid-order and strain-order CSVs, the strain side an EXCEPT
  *    (Oracle MINUS) against plasmid-named items.
  *
  * The reference walks DBI cursors row-by-row with driver-side caches;
  * here each dump is one declarative join/group plan. Two reference
  * quirks are deliberately NOT reproduced (both documented here so the
  * divergence is auditable):
  *
  *  1. colleague2gene and curatornotes flush their one-key cache only
  *     when the NEXT key arrives (colleague2gene.pm:58-63,
  *     curatornotes.pm:87-93), so the FINAL group is never written —
  *     a silent last-row data loss the set-based groupBy does not have.
  *  2. curatornotes' `empty_note` (curatornotes.pm:106-116) returns
  *     false for undef/'' notes (only whitespace-only notes return
  *     true), so truly-empty notes are INCLUDED as empty CSV fields
  *     while whitespace-only ones are excluded; here both are excluded.
  *
  * Row and group orderings the reference leaves to the database cursor
  * are pinned (ORDER BY key, `sort_array` within groups) so output is
  * deterministic on any engine.
  */
object CrmExport {

  /** Text::CSV-compatible field encoding (the reference's writer,
    * auto_diag/binary defaults): quote only fields carrying the
    * separator, a quote, or a line break; double embedded quotes; undef
    * prints as an empty bare field. */
  private[export] def csvField(c: Column): Column =
    when(c.isNull, lit(""))
      .otherwise(when(c.rlike("[,\"\n\r]"),
        concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))
        .otherwise(c))

  private def csvLine(cols: Column*): Column =
    concat_ws(",", cols.map(csvField): _*)

  /** A variable-width CSV line: fixed head columns followed by every
    * element of `arr` — the shape of the relations / gene-list /
    * notes rows. */
  private def csvLineWithArray(head: Seq[Column], arr: Column): Column = {
    val tail = array_join(transform(arr, e => csvField(e)), ",")
    when(size(arr) > 0, concat(concat_ws(",", head.map(csvField): _*),
      lit(","), tail))
      .otherwise(concat_ws(",", head.map(csvField): _*))
  }

  /** Prefix a header line and pin a global order: the header sorts
    * first (rank 0), data rows by `key` (rank 1). Under the default
    * partitioned write the orderBy range-partitions the frame, so the
    * header is still the first line of the first part file. */
  private def withHeader(header: String, data: DataFrame): DataFrame = {
    val spark = data.sparkSession
    val hdr = spark.range(1)
      .select(lit(header).as("value"), lit(0).as("rank"), lit("").as("key"))
    hdr.unionByName(data.select(col("value"), lit(1).as("rank"),
        col("key").cast("string").as("key")))
      .orderBy(col("rank"), col("key"), col("value"))
      .select(col("value"))
  }

  // ---------------------------------------------------------------- //
  // colleague
  // ---------------------------------------------------------------- //

  /** The colleague table dump (colleague.pm `_colleague_sql`,
    * :43-74 + the cursor's first-seen email dedup, :164-181).
    *
    * Contracts: `colleague` (colleague_no, first_name, last_name,
    * suffix, profession, job_title, institution, address1, address2,
    * address3, address4, city, state, region, country, postal_code,
    * is_subscribed); `collEmail` (colleague_no, email_no); `email`
    * (email_no, email); `collPhone` (colleague_no, phone_no); `phone`
    * (phone_no, phone_num); `remark` (colleague_no, remark).
    *
    * The reference's dedup keeps whichever row the cursor returns
    * first (unordered); here W1 row_number keeps the deterministic
    * minimum of (colleague_no, phone_num, remark). Address lines 2-4
    * concatenate with Oracle `||` null-as-empty semantics (spaces
    * always present). Returns one column per output field plus the
    * `email` sort key. */
  def colleagueRows(colleague: DataFrame, collEmail: DataFrame,
                    email: DataFrame, collPhone: DataFrame, phone: DataFrame,
                    remark: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = colleague
      .join(collEmail, Seq("colleague_no"))
      .join(email, Seq("email_no"))
      .join(collPhone, Seq("colleague_no"), "left_outer")
      .join(phone, Seq("phone_no"), "left_outer")
      .join(remark, Seq("colleague_no"), "left_outer")
      .withColumn("address2", concat(
        coalesce(col("address2"), lit("")), lit(" "),
        coalesce(col("address3"), lit("")), lit(" "),
        coalesce(col("address4"), lit(""))))
      .withColumnRenamed("postal_code", "zipcode")
      .withColumnRenamed("remark", "research_interest")
    val w = Window.partitionBy(col("email"))
      .orderBy(col("colleague_no"), col("phone_num"), col("research_interest"))
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("colleague_no"), col("email"), col("first_name"),
        col("last_name"), col("suffix"), col("profession"), col("job_title"),
        col("institution"), col("address1"), col("address2"), col("city"),
        col("state"), col("region"), col("country"), col("zipcode"),
        col("is_subscribed"), col("phone_num"), col("research_interest"))
  }

  /** [[colleagueRows]] as headered CSV lines (colleague.pm:148-155 —
    * 17 labels, reproduced verbatim including the reference's
    * "Resarch interest" typo; its embedded-newline "Country" label is
    * normalized). */
  def colleagueCsvLines(rows: DataFrame): DataFrame = {
    val header = "Email,First name,Last name,Suffix,Profession," +
      "Job Title,Institution,First address,Second Address,City,State," +
      "Region,Country,Zipcode,Subscribed,Phone no,Resarch interest"
    withHeader(header, rows.select(csvLine(
      col("email"), col("first_name"), col("last_name"), col("suffix"),
      col("profession"), col("job_title"), col("institution"),
      col("address1"), col("address2"), col("city"), col("state"),
      col("region"), col("country"), col("zipcode"), col("is_subscribed"),
      col("phone_num"), col("research_interest")).as("value"),
      col("email").as("key")))
  }

  /** Group-leader → member-email relations (colleague.pm
    * `_collg_rel_sql`, :17-32 + :183-198): `pi` (pi_no = leader
    * colleague_no, colleague_no = member); leaders resolve to every
    * email they carry, members likewise; one row per leader email with
    * ≥1 member. Member lists are distinct-sorted (the reference emits
    * raw cursor order). */
  def colleagueRelations(pi: DataFrame, collEmail: DataFrame,
                         email: DataFrame): DataFrame = {
    val ce = collEmail.join(email, Seq("email_no"))
      .select(col("colleague_no"), col("email"))
    pi
      .join(ce.select(col("colleague_no").as("pi_no"),
        col("email").as("leader_email")), Seq("pi_no"))
      .join(ce.select(col("colleague_no"), col("email").as("member_email")),
        Seq("colleague_no"))
      .groupBy(col("leader_email"))
      .agg(sort_array(collect_set(col("member_email"))).as("members"))
  }

  /** [[colleagueRelations]] as headered CSV lines
    * (colleague.pm:156). */
  def colleagueRelationCsvLines(rels: DataFrame): DataFrame =
    withHeader("Group leader email,Member emails",
      rels.select(
        csvLineWithArray(Seq(col("leader_email")), col("members")).as("value"),
        col("leader_email").as("key")))

  // ---------------------------------------------------------------- //
  // colleague2gene
  // ---------------------------------------------------------------- //

  /** colleague email → associated gene ids (colleague2gene.pm
    * `statement`, :13-28): email → coll_email → coll_locus →
    * feature.uniquename, one row per email. Contracts: `email`
    * (email_no, email); `collEmail` (colleague_no, email_no);
    * `collLocus` (colleague_no, locus_no); `feature` (feature_id,
    * uniquename). Gene lists sort within the group (the reference
    * keeps unordered cursor order — and drops the final email's row
    * entirely, see the object scaladoc). */
  def colleagueGenes(email: DataFrame, collEmail: DataFrame,
                     collLocus: DataFrame, feature: DataFrame): DataFrame =
    email
      .join(collEmail, Seq("email_no"))
      .join(collLocus, Seq("colleague_no"))
      .join(feature, col("locus_no") === col("feature_id"))
      .groupBy(col("email"))
      .agg(sort_array(collect_list(col("uniquename"))).as("genes"))

  /** [[colleagueGenes]] as headered CSV lines (colleague2gene.pm:51). */
  def colleagueGeneCsvLines(rows: DataFrame): DataFrame =
    withHeader("Colleague email,Gene IDs",
      rows.select(csvLineWithArray(Seq(col("email")), col("genes")).as("value"),
        col("email").as("key")))

  // ---------------------------------------------------------------- //
  // curatornotes
  // ---------------------------------------------------------------- //

  /** Gene accession → curator notes of one visibility class
    * (curatornotes.pm `statement`, :15-39): featureprop values typed
    * `public note` / `private note` on non-deleted genes, keyed by the
    * feature's dbxref accession. Contracts: `featureprop` (feature_id,
    * prop_type, note); `feature` (feature_id, ftype, dbxref_id,
    * is_deleted 0/1); `dbxref` (dbxref_id, accession).
    *
    * `noteType` is "public" or "private" (the command's --note enum,
    * :55-61). Notes clean CRLF → space (cleanup_note, :118-125);
    * null/empty/whitespace-only notes drop (stricter than the
    * reference's empty_note, see the object scaladoc); genes left
    * with no notes emit no row (matching the reference — a gene only
    * enters its cache with a valid note). */
  def curatorNotes(featureprop: DataFrame, feature: DataFrame,
                   dbxref: DataFrame, noteType: String): DataFrame = {
    require(noteType == "public" || noteType == "private",
      s"note type must be public or private, got $noteType")
    featureprop
      .filter(col("prop_type") === s"$noteType note")
      .join(feature.filter(col("ftype") === "gene" && col("is_deleted") === 0),
        Seq("feature_id"))
      .join(dbxref, Seq("dbxref_id"))
      .withColumn("note", regexp_replace(col("note"), "\r\n", " "))
      .filter(col("note").isNotNull && trim(col("note")) =!= "")
      .groupBy(col("accession"))
      .agg(sort_array(collect_list(col("note"))).as("notes"))
  }

  /** [[curatorNotes]] as headered CSV lines (curatornotes.pm:72). */
  def curatorNoteCsvLines(rows: DataFrame): DataFrame =
    withHeader("Gene ID,Notes",
      rows.select(csvLineWithArray(Seq(col("accession")), col("notes")).as("value"),
        col("accession").as("key")))

  // ---------------------------------------------------------------- //
  // dscorders
  // ---------------------------------------------------------------- //

  /** Plasmid orders (dscorders.pm `_plasmid_sql`, :17-30): plasmid
    * name-matched stock items joined through their order to the
    * ordering colleague's email(s). Contracts: `plasmid` (name);
    * `stockItemOrder` (stock_item_order_id, item, item_id);
    * `stockOrder` (stock_order_id, colleague_id, order_date);
    * `collEmail`/`email` as in [[colleagueRows]]. Ordered by
    * (order_date, email) like the reference SQL. */
  def plasmidOrders(plasmid: DataFrame, stockItemOrder: DataFrame,
                    stockOrder: DataFrame, collEmail: DataFrame,
                    email: DataFrame): DataFrame =
    plasmid.select(col("name"))
      .join(stockItemOrder, col("name") === col("item"))
      .join(stockOrder,
        col("stock_order_id") === col("stock_item_order_id"))
      .join(collEmail.withColumnRenamed("colleague_no", "colleague_id"),
        Seq("colleague_id"))
      .join(email, Seq("email_no"))
      .select(col("email"), col("name"), col("order_date"))

  /** Strain orders (dscorders.pm `_strain_sql`, :32-54): every
    * (order, item) pair EXCEPT the plasmid-named ones (the Oracle
    * MINUS → U1), resolved through stock_center to the strain's
    * dbxref accession. Extra contracts: `stockCenter` (id,
    * dbxref_id); `dbxref` (dbxref_id, accession). */
  def strainOrders(plasmid: DataFrame, stockItemOrder: DataFrame,
                   stockOrder: DataFrame, collEmail: DataFrame,
                   email: DataFrame, stockCenter: DataFrame,
                   dbxref: DataFrame): DataFrame = {
    val allItems = stockItemOrder
      .select(col("stock_item_order_id").as("orid"), col("item_id"))
    val plasmidItems = plasmid.select(col("name"))
      .join(stockItemOrder, col("name") === col("item"))
      .select(col("stock_item_order_id").as("orid"), col("item_id"))
    allItems.except(plasmidItems)
      .join(stockCenter, col("id") === col("item_id"))
      .join(stockOrder, col("stock_order_id") === col("orid"))
      .join(collEmail.withColumnRenamed("colleague_no", "colleague_id"),
        Seq("colleague_id"))
      .join(email, Seq("email_no"))
      .join(dbxref, Seq("dbxref_id"))
      .select(col("email"), col("accession").as("strain_id"),
        col("order_date"))
  }

  /** Order frames as headered CSV lines (dscorders.pm:116,133), ordered
    * by (order_date, email) like the reference SQL; `idLabel` is
    * "Name" for plasmids, "Strain_id" for strains. */
  def orderCsvLines(orders: DataFrame, idCol: String,
                    idLabel: String): DataFrame =
    withHeader(s"Email,$idLabel,Date",
      orders.select(
        csvLine(col("email"), col(idCol), col("order_date")).as("value"),
        concat_ws(" ", col("order_date"), col("email")).as("key")))
}
