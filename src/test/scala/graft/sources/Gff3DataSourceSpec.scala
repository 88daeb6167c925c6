package graft.sources

import java.nio.file.Files
import graft.SparkSpec

class Gff3DataSourceSpec extends SparkSpec {

  // 40 features so tiny split sizes produce many ranges
  private lazy val path = {
    val sb = new StringBuilder("##gff-version 3\n")
    (1 to 40).foreach { i =>
      sb ++= s"chr1\tt\tgene\t${i * 100}\t${i * 100 + 50}\t.\t+\t.\tID=g$i;Alias=a$i\n"
    }
    sb ++= "##FASTA\n>chr1\nACGTACGT\n"
    val f = Files.createTempFile("dsv2", ".gff3")
    Files.writeString(f, sb.toString)
    f.toString
  }

  private def readV2(maxSplitBytes: Long) =
    spark.read.format("graft.sources.v2.Gff3DataSource")
      .option("maxSplitBytes", maxSplitBytes.toString)
      .load(path)

  test("DSv2 read matches the mapPartitions reader") {
    val expected = Gff3.features(spark, path).collect()
      .map(r => (r.seqId, r.ftype, r.fmin, r.fmax)).toSet
    val got = readV2(1 << 20).select("seqId", "ftype", "fmin", "fmax")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == expected && got.size == 40)
  }

  test("byte-range splits cover every line exactly once") {
    // force many tiny splits; boundary lines must have exactly one owner
    for (splitBytes <- Seq(37L, 64L, 128L, 999L)) {
      val df = readV2(splitBytes)
      assert(df.rdd.getNumPartitions > 1 || splitBytes == 999L)
      val ids = df.selectExpr("element_at(attributes, 'ID')[0]")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(ids == (1 to 40).map(i => s"g$i").sorted,
        s"splitBytes=$splitBytes lost or duplicated rows")
    }
  }

  test("multi-byte UTF-8 content keeps split accounting exact") {
    // every line carries 2- and 3-byte characters plus a 4-byte
    // supplementary codepoint, so nearly every tiny-split boundary
    // lands inside a multi-byte sequence; byte-level skip + arithmetic
    // UTF-8 lengths must still give every line exactly one owner
    val sb = new StringBuilder("##gff-version 3\n")
    (1 to 30).foreach { i =>
      sb ++= s"chr1\tt\tgene\t${i * 10}\t${i * 10 + 5}\t.\t+\t.\t" +
        s"ID=u$i;Note=café 世界 ${new String(Character.toChars(0x1F600))}\n"
    }
    val f = Files.createTempFile("dsv2utf8", ".gff3")
    Files.writeString(f, sb.toString)
    for (splitBytes <- Seq(23L, 41L, 77L)) {
      val ids = spark.read.format("graft.sources.v2.Gff3DataSource")
        .option("maxSplitBytes", splitBytes.toString)
        .load(f.toString)
        .selectExpr("element_at(attributes, 'ID')[0]")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(ids == (1 to 30).map(i => s"u$i").sorted,
        s"splitBytes=$splitBytes lost or duplicated rows")
    }
  }

  test("glob paths and directory listings skip metadata files") {
    val dir = Files.createTempDirectory("dsv2glob")
    Files.writeString(dir.resolve("a.gff3"),
      "chr1\tt\tgene\t1\t10\t.\t+\t.\tID=ga\n")
    Files.writeString(dir.resolve("b.gff3"),
      "chr1\tt\tgene\t2\t20\t.\t+\t.\tID=gb\n")
    Files.writeString(dir.resolve("_SUCCESS"), "")
    Files.writeString(dir.resolve(".hidden.crc"), "binary\tgarbage")
    def ids(p: String) = spark.read.format("graft.sources.v2.Gff3DataSource")
      .load(p).selectExpr("element_at(attributes, 'ID')[0]")
      .collect().map(_.getString(0)).toSet
    assert(ids(s"$dir/*.gff3") == Set("ga", "gb")) // glob
    assert(ids(dir.toString) == Set("ga", "gb")) // dir listing skips _ and .
  }

  test("filter pushdown and column pruning produce correct results") {
    val df = readV2(1 << 20)
    // pruned (no attributes) + pushed ftype filter
    val got = df.where("ftype = 'gene' AND seqId = 'chr1'")
      .select("fmin", "fmax").collect()
    assert(got.length == 40)
    // pruned projection returns right columns and values
    val fmins = df.select("fmin").collect().map(_.getInt(0)).sorted
    assert(fmins.head == 99 && fmins.length == 40)
    // a filter that matches nothing
    assert(df.where("ftype = 'nope'").count() == 0)
    // mixed: pushed + unpushable filter together
    assert(df.where("ftype = 'gene' AND fmin > 2000").count() ==
      (1 to 40).count(i => i * 100 - 1 > 2000))
  }

  test("pushed filters appear in the scan metadata") {
    val plan = readV2(1 << 20).where("ftype = 'gene'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Gff3Scan") || plan.contains("BatchScan"))
  }

  test("schema exposes the typed GFF3 shape incl. the attribute map") {
    val df = readV2(1 << 20)
    assert(df.schema.fieldNames.toSeq ==
      Seq("seqId", "source", "ftype", "fmin", "fmax", "score", "strand", "phase", "attributes"))
    val aliases = df.selectExpr("element_at(attributes, 'Alias')[0] AS a")
      .where("a = 'a7'").count()
    assert(aliases == 1)
  }
}
