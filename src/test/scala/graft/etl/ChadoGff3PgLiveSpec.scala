package graft.etl

import graft.SparkSpec
import graft.sinks.{PgDialect, PgLiveHarness}
import graft.sources.Gff3
import org.apache.spark.sql.DataFrame

/** The reference's DEEPEST acceptance contract, executed on the
  * reference's own engine family: the gff3tochado staging→merge DAG
  * run end-to-end against a live throwaway PostgreSQL cluster with
  * the reference's own fixture (t/test_data/gff3/test1.gff3),
  * asserting the reference's exact per-table insert counts
  * (t/lib/ChadoGFF3.pm:120-139) AND the zero-delta identical re-load
  * — through [[PgDialect]]'s generated DDL, COPY encoding, and
  * LEFT-JOIN-IS-NULL novelty inserts (the share/postgresql_gff3.lib
  * statement shapes), all inside one BEGIN/COMMIT per load like the
  * reference's txn_scope_guard.
  *
  * The staging frames come from the engine's own reference-exact
  * staging ([[Gff3ToChado.stageRefCompat]] — already pinned to the
  * golden hash Spark-side by [[Gff3ToChadoSpec]]); this suite proves
  * the same numbers survive the POSTGRES arm: CSV COPY round-trip of
  * every staged value, real SQL novelty joins, real transactional
  * visibility. Cancels (never passes vacuously) without a Postgres
  * install or the reference checkout. */
class ChadoGff3PgLiveSpec extends SparkSpec with PgLiveHarness {

  private val fixture = "/root/reference/t/test_data/gff3/test1.gff3"

  /** The reference's golden first-load hash, ChadoGFF3.pm:120-139
    * (temp_new_feature/new_feature collapse to one number here: the
    * natural-key merge has no separate temp-id statement). */
  private val golden = Map(
    "feature" -> 53L, "featureloc" -> 51L, "featureloc_target" -> 2L,
    "analysisfeature" -> 6L, "synonym" -> 3L, "feature_synonym" -> 4L,
    "feature_relationship" -> 39L, "dbxref" -> 5L,
    "feature_dbxref" -> 6L, "featureprop" -> 12L)

  /** One counted novelty insert: [[PgDialect.insertMissing]]'s exact
    * statement wrapped in a data-modifying CTE so the transaction
    * script reports per-table inserted-row counts on stdout. */
  private def countedInsert(tag: String, target: String, staging: String,
                            keyCols: Seq[String], allCols: Seq[String],
                            extraWhere: String = ""): String = {
    val ins = PgDialect.insertMissing(target, staging, keyCols, allCols)
    s"WITH ins AS ($ins$extraWhere RETURNING 1) " +
      s"SELECT '$tag=' || COUNT(*) FROM ins;"
  }

  test("the reference's golden-count contract holds end-to-end on live Postgres, plus zero-delta re-load") {
    live()
    assume(new java.io.File(fixture).canRead,
      "reference fixture not present in this environment")

    def staging(): Gff3ToChado.Staging = Gff3ToChado.stageRefCompat(spark,
      Gff3.featuresWithLine(spark, fixture))
    val st = staging()

    // (tag, live table, staging frame, merge keys); featureloc's two
    // golden numbers are the same table split by rank — the
    // reference's insert_new_featureloc / insert_new_featureloc_target
    // statement pair
    val tables: Seq[(String, DataFrame, Seq[String])] = Seq(
      ("feature", st.feature, Seq("uniquename")),
      ("featureloc", st.featureloc, Seq("uniquename", "rank")),
      ("analysisfeature", st.analysisfeature, Seq("uniquename", "analysis")),
      ("synonym", st.synonym, Seq("alias")),
      ("feature_synonym", st.featureSynonym, Seq("uniquename", "alias")),
      ("dbxref", st.dbxref, Seq("db", "accession")),
      ("feature_dbxref", st.featureDbxref,
        Seq("uniquename", "db", "accession")),
      ("feature_relationship", st.featureRelationship,
        Seq("subject", "object", "reltype")),
      ("featureprop", st.featureprop, Seq("uniquename", "prop", "rank")))

    // schema DDL straight from the staging frames' Spark schemas —
    // the same generator JdbcStore uses, target + staging pairs
    val ddl = tables.map { case (t, df, _) =>
      PgDialect.stagingDdl(s"chado_$t", df.schema, temp = false) + ";\n" +
        PgDialect.stagingDdl(s"temp_$t", df.schema, temp = false) + ";"
    }.mkString("\n")
    val (dc, dout) = psql(ddl)
    assert(dc == 0, s"schema DDL failed:\n$dout")

    def copyStaging(stg: Gff3ToChado.Staging): Unit = {
      val frames = Seq(
        "feature" -> stg.feature, "featureloc" -> stg.featureloc,
        "analysisfeature" -> stg.analysisfeature, "synonym" -> stg.synonym,
        "feature_synonym" -> stg.featureSynonym, "dbxref" -> stg.dbxref,
        "feature_dbxref" -> stg.featureDbxref,
        "feature_relationship" -> stg.featureRelationship,
        "featureprop" -> stg.featureprop)
      frames.foreach { case (t, df) =>
        val rows = df.collect().map(r => PgDialect.copyEncode(r.toSeq))
        if (rows.nonEmpty) {
          val (cc, cout) = psqlCopy(
            PgDialect.copyFrom(s"temp_$t", df.schema.fieldNames.toSeq),
            rows.mkString("\n"))
          assert(cc == 0, s"COPY into temp_$t failed:\n$cout")
        }
      }
    }

    // the merge DAG: every table's novelty insert inside ONE
    // transaction, each reporting its inserted-row count — the
    // featureloc arms carry the rank predicate like the reference's
    // two .lib statements
    def mergeScript: String = {
      val stmts = tables.flatMap { case (t, df, keys) =>
        val cols = df.schema.fieldNames.toSeq
        if (t == "featureloc") Seq(
          countedInsert("featureloc", "chado_featureloc", "temp_featureloc",
            keys, cols, " AND s.rank = 0"),
          countedInsert("featureloc_target", "chado_featureloc",
            "temp_featureloc", keys, cols, " AND s.rank = 1"))
        else Seq(countedInsert(t, s"chado_$t", s"temp_$t", keys, cols))
      }
      "BEGIN;\n" + stmts.mkString("\n") + "\nCOMMIT;"
    }

    def runMerge(): Map[String, Long] = {
      val (mc, mout) = psql(mergeScript)
      assert(mc == 0, s"merge transaction failed:\n$mout")
      mout.linesIterator.filter(_.contains("=")).map { l =>
        val Array(k, v) = l.trim.split("=", 2)
        k -> v.toLong
      }.toMap
    }

    copyStaging(st)
    val counts = runMerge()
    assert(counts == golden,
      s"live-Postgres first load must match the reference's golden " +
        s"hash, got $counts")
    assert(query("SELECT COUNT(*) FROM chado_feature") == Seq("53"))
    assert(query("SELECT COUNT(*) FROM chado_featureloc") == Seq("53"),
      "51 rank-0 + 2 rank-1 locations")

    // the reference's idempotence gate: truncate staging, re-stage the
    // SAME file (auto ids re-derive from line order, so they collide
    // exactly), re-COPY, re-merge — zero new rows everywhere
    assert(psql(tables.map(t => s"TRUNCATE temp_${t._1};").mkString("\n"))
      ._1 == 0)
    copyStaging(staging())
    val again = runMerge()
    assert(again.values.forall(_ == 0L),
      s"identical re-load must insert zero rows everywhere, got $again")
    assert(query("SELECT COUNT(*) FROM chado_feature") == Seq("53"))

    // the reference's UPDATE contract (ChadoGFF3UpdateRunner.pm:
    // test2.gff3 into the store test1 built, auto-id counter
    // continuing across loads; updated hash ChadoGFF3.pm:141-162)
    val fixture2 = "/root/reference/t/test_data/gff3/test2.gff3"
    assume(new java.io.File(fixture2).canRead,
      "reference update fixture not present")
    val goldenUpdate = Map(
      "feature" -> 21L, "featureloc" -> 21L, "featureloc_target" -> 0L,
      "analysisfeature" -> 0L, "synonym" -> 0L, "feature_synonym" -> 0L,
      "feature_relationship" -> 19L, "dbxref" -> 0L,
      "feature_dbxref" -> 0L, "featureprop" -> 10L)
    val recs1 = Gff3.featuresWithLine(spark, fixture)
    val idless1 = recs1.filter(
      org.apache.spark.sql.functions
        .expr("element_at(attributes, 'ID')[0]").isNull).count()
    val st2 = Gff3ToChado.stageRefCompat(spark,
      Gff3.featuresWithLine(spark, fixture2), autoIdFrom = idless1 + 1L)
    assert(psql(tables.map(t => s"TRUNCATE temp_${t._1};").mkString("\n"))
      ._1 == 0)
    copyStaging(st2)
    val updated = runMerge()
    assert(updated == goldenUpdate,
      s"live-Postgres update load must match the reference's updated " +
        s"hash, got $updated")
    assert(query("SELECT COUNT(*) FROM chado_feature") == Seq("74"),
      "53 first-load + 21 update features")
  }
}
