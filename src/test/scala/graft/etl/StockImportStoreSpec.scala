package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dictystrain2chado / dictyplasmid2chado store import
  * (lib/Modware/Import/Command + Stock importers): data_dir file
  * dispatch, id gates, html→wiki descriptions, both-ends relationship
  * resolution with skip accounting, per-table insert counts and
  * re-import idempotence.
  */
class StockImportStoreSpec extends SparkSpec {

  private def fixture(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("stockimp")
    def w(name: String, s: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), s)
    w("strain_strain.tsv",
      "DBS0000001\taxeA mutant\tD. discoideum\t<b>axenic</b> strain\n" +
        "DBS0000002\taxeB mutant\tD. discoideum\t\n" +
        "BADID12345\tnope\tx\t\n")
    w("strain_props.tsv",
      "DBS0000001\tmutagenesis method\tUV\n" +
        "DBS0000002\tgenotype\taxeB-\n" +
        "DBS0000002\tsynonym\t\n") // empty value -> NULL key component
    w("strain_parent.tsv",
      "DBS0000002\tDBS0000001\n" + // resolvable
        "DBS0000001\tDBS9999999\n") // parent never loaded -> skipped
    w("strain_plasmid.tsv", "DBS0000001\tDBP0000001\n")
    w("strain_publications.tsv", "DBS0000001\tPMID:123\n")
    w("plasmid_plasmid.tsv",
      "DBP0000001\tpDM304\texpression vector\n" +
        "WRONG00001\tx\ty\n")
    val store = java.nio.file.Files.createTempDirectory("stockstore")
    (dir.toString, store.toString)
  }

  test("plasmid-then-strain import: counts, gates, wiki text, links") {
    val (dataDir, store) = fixture()
    // reference order: plasmids load before strain-plasmid links resolve
    val pc = StockImport.mergeIntoStore(spark,
      StockImport.plasmidStaging(spark, dataDir), store)
    assert(pc("stock") == 1) // WRONG id dropped at the gate
    assert(pc("stock_relationship") == 0 && pc("stock_pub") == 0)

    val sc = StockImport.mergeIntoStore(spark,
      StockImport.strainStaging(spark, dataDir), store)
    assert(sc("stock") == 2) // BADID dropped
    assert(sc("stockprop") == 3) // incl. the NULL-valued synonym row
    // parent edge + plasmid part_of edge resolve; unknown parent skipped
    assert(sc("stock_relationship") == 2)
    assert(sc("relationship_skipped") == 1)
    assert(sc("stock_pub") == 1)

    val stock = spark.read.parquet(s"$store/stock")
    assert(stock.count() == 3)
    // F14: descriptions go through the html->wiki chain (import_stock)
    val desc = stock.filter(col("stock_id") === "DBS0000001")
      .select(col("description")).collect().head.getString(0)
    assert(desc == "'''axenic''' strain")
    val rel = spark.read.parquet(s"$store/stock_relationship")
      .select(col("object_id"), col("subject_id"), col("reltype"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rel == Set(
      ("DBS0000002", "DBS0000001", "is_parent_of"),
      ("DBS0000001", "DBP0000001", "part_of")))

    // re-import both kinds: every insert count is zero
    val pc2 = StockImport.mergeIntoStore(spark,
      StockImport.plasmidStaging(spark, dataDir), store)
    val sc2 = StockImport.mergeIntoStore(spark,
      StockImport.strainStaging(spark, dataDir), store)
    for (m <- Seq(pc2, sc2); t <- Seq("stock", "stockprop",
        "stock_relationship", "stock_pub"))
      assert(m(t) == 0L, s"re-import inserted into $t")
  }

  test("missing data files stage as empty frames (file dispatch)") {
    val dir = java.nio.file.Files.createTempDirectory("stockempty")
    java.nio.file.Files.writeString(dir.resolve("strain_strain.tsv"),
      "DBS0000003\tsolo\tD. discoideum\t\n")
    val st = StockImport.strainStaging(spark, dir.toString)
    assert(st.stock.count() == 1)
    assert(st.stockprop.count() == 0 && st.relationship.count() == 0 &&
      st.pub.count() == 0)
  }
}
