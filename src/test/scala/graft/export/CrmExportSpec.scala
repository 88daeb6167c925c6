package graft.export

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The four legacy CRM / stock-center dumps (colleague,
  * colleague2gene, curatornotes, dscorders) on hand-checked fixtures
  * mirroring the reference SQL's join paths. */
class CrmExportSpec extends SparkSpec {
  import spark.implicits._

  private def colleagueFrames = {
    val colleague = Seq(
      (1, "Ada", "Lovelace", null, "prof", "PI", "Analytical U",
        "1 Engine Way", "Suite 2", "Floor 3", null, "London", null, null,
        "UK", "N1", "1"),
      (2, "Grace", "Hopper", null, "prof", "RA", "Navy U",
        "2 Compiler St", null, null, null, "Arlington", "VA", null, "US",
        "22201", "0"),
      // second colleague sharing ada's email: the dedup target
      (3, "Ada", "Dup", null, null, null, null, null, null, null, null,
        null, null, null, null, null, "1"))
      .toDF("colleague_no", "first_name", "last_name", "suffix",
        "profession", "job_title", "institution", "address1", "address2",
        "address3", "address4", "city", "state", "region", "country",
        "postal_code", "is_subscribed")
    val collEmail = Seq((1, 10), (2, 20), (3, 10)).toDF("colleague_no", "email_no")
    val email = Seq((10, "ada@a.org"), (20, "grace@n.mil")).toDF("email_no", "email")
    val collPhone = Seq((1, 100)).toDF("colleague_no", "phone_no")
    val phone = Seq((100, "555-1")).toDF("phone_no", "phone_num")
    val remark = Seq((1, "engines, with \"quotes\"")).toDF("colleague_no", "remark")
    (colleague, collEmail, email, collPhone, phone, remark)
  }

  test("colleague rows dedup by email and concatenate addresses Oracle-style") {
    val (c, ce, e, cp, p, r) = colleagueFrames
    val rows = CrmExport.colleagueRows(c, ce, e, cp, p, r)
      .orderBy(col("email")).collect()
    assert(rows.length == 2, "3 colleagues, 2 distinct emails")
    val ada = rows(0)
    assert(ada.getAs[String]("email") == "ada@a.org")
    // lowest colleague_no wins the dedup, not the no-detail duplicate
    assert(ada.getAs[String]("last_name") == "Lovelace")
    // address2..4 concatenate with null-as-empty, spaces always present
    assert(ada.getAs[String]("address2") == "Suite 2 Floor 3 ")
    assert(ada.getAs[String]("phone_num") == "555-1")
  }

  test("colleague CSV carries the 17-label header and quotes embedded quotes") {
    val (c, ce, e, cp, p, r) = colleagueFrames
    val lines = CrmExport.colleagueCsvLines(CrmExport.colleagueRows(c, ce, e, cp, p, r))
      .as[String].collect()
    assert(lines.head.startsWith("Email,First name,Last name,") &&
      lines.head.endsWith("Phone no,Resarch interest"))
    assert(lines.head.split(",").length == 17)
    // Text::CSV quoting: embedded quotes double inside a quoted field
    assert(lines(1).contains("\"engines, with \"\"quotes\"\"\""))
    assert(lines.length == 3)
  }

  test("colleague relations emit one row per PI with sorted member emails") {
    val (_, ce, e, _, _, _) = colleagueFrames
    // ada (1) leads grace (2) and the dup (3, same email as ada)
    val pi = Seq((1, 2), (1, 3)).toDF("pi_no", "colleague_no")
    val rels = CrmExport.colleagueRelations(pi, ce, e).collect()
    assert(rels.length == 1)
    assert(rels(0).getAs[String]("leader_email") == "ada@a.org")
    assert(rels(0).getAs[scala.collection.Seq[String]]("members").toSeq ==
      Seq("ada@a.org", "grace@n.mil"))
    val lines = CrmExport.colleagueRelationCsvLines(
      CrmExport.colleagueRelations(pi, ce, e)).as[String].collect()
    assert(lines.toSeq == Seq("Group leader email,Member emails",
      "ada@a.org,ada@a.org,grace@n.mil"))
  }

  test("colleague2gene groups every email including the last (reference drops it)") {
    val email = Seq((10, "ada@a.org"), (20, "grace@n.mil")).toDF("email_no", "email")
    val ce = Seq((1, 10), (2, 20)).toDF("colleague_no", "email_no")
    val cl = Seq((1, 7L), (1, 8L), (2, 9L)).toDF("colleague_no", "locus_no")
    val feat = Seq((7L, "DDB_G1"), (8L, "DDB_G2"), (9L, "DDB_G3"))
      .toDF("feature_id", "uniquename")
    val lines = CrmExport.colleagueGeneCsvLines(
      CrmExport.colleagueGenes(email, ce, cl, feat)).as[String].collect()
    // grace is the LAST email group — the reference's streaming cache
    // (colleague2gene.pm:53-67) would silently drop her row
    assert(lines.toSeq == Seq("Colleague email,Gene IDs",
      "ada@a.org,DDB_G1,DDB_G2", "grace@n.mil,DDB_G3"))
  }

  test("curatornotes filters type/deleted/blank and cleans CRLF") {
    val fp = Seq(
      (1L, "public note", "first note"),
      (1L, "public note", "crlf\r\nnote"),
      (1L, "private note", "hidden"),
      (2L, "public note", "   "),            // whitespace-only: dropped
      (3L, "public note", "note on deleted"),
      (4L, "public note", "non-gene note"))
      .toDF("feature_id", "prop_type", "note")
    val feat = Seq(
      (1L, "gene", 11L, 0), (2L, "gene", 12L, 0),
      (3L, "gene", 13L, 1),                  // deleted
      (4L, "mRNA", 14L, 0))                  // wrong type
      .toDF("feature_id", "ftype", "dbxref_id", "is_deleted")
    val dbx = Seq((11L, "DDB_G1"), (12L, "DDB_G2"), (13L, "DDB_G3"),
      (14L, "DDB_T1")).toDF("dbxref_id", "accession")
    val lines = CrmExport.curatorNoteCsvLines(
      CrmExport.curatorNotes(fp, feat, dbx, "public")).as[String].collect()
    assert(lines.toSeq == Seq("Gene ID,Notes", "DDB_G1,crlf note,first note"))
    val priv = CrmExport.curatorNotes(fp, feat, dbx, "private").collect()
    assert(priv.length == 1 &&
      priv(0).getAs[scala.collection.Seq[String]]("notes").toSeq == Seq("hidden"))
    intercept[IllegalArgumentException] {
      CrmExport.curatorNotes(fp, feat, dbx, "secret")
    }
  }

  test("dscorders splits plasmid-named items from strains via EXCEPT") {
    val plasmid = Seq(Tuple1("pGFP")).toDF("name")
    val sitem = Seq(
      (100, "pGFP", 1L),      // plasmid order
      (101, "DBS0301", 2L))   // strain order
      .toDF("stock_item_order_id", "item", "item_id")
    val sorder = Seq((100, 1, "2013-05-12"), (101, 2, "2013-04-01"))
      .toDF("stock_order_id", "colleague_id", "order_date")
    val ce = Seq((1, 10), (2, 20)).toDF("colleague_no", "email_no")
    val email = Seq((10, "ada@a.org"), (20, "grace@n.mil")).toDF("email_no", "email")
    val sc = Seq((2L, 31L)).toDF("id", "dbxref_id")
    val dbx = Seq((31L, "DBS0301")).toDF("dbxref_id", "accession")

    val p = CrmExport.orderCsvLines(
      CrmExport.plasmidOrders(plasmid, sitem, sorder, ce, email),
      "name", "Name").as[String].collect()
    assert(p.toSeq == Seq("Email,Name,Date", "ada@a.org,pGFP,2013-05-12"))

    val s = CrmExport.orderCsvLines(
      CrmExport.strainOrders(plasmid, sitem, sorder, ce, email, sc, dbx),
      "strain_id", "Strain_id").as[String].collect()
    // the plasmid-named item MINUSes out; date-first ordering
    assert(s.toSeq == Seq("Email,Strain_id,Date",
      "grace@n.mil,DBS0301,2013-04-01"))
  }
}
