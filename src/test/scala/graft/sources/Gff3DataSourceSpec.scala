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

  test("schema exposes the typed GFF3 shape incl. the attribute map") {
    val df = readV2(1 << 20)
    assert(df.schema.fieldNames.toSeq ==
      Seq("seqId", "source", "ftype", "fmin", "fmax", "score", "strand", "phase", "attributes"))
    val aliases = df.selectExpr("element_at(attributes, 'Alias')[0] AS a")
      .where("a = 'a7'").count()
    assert(aliases == 1)
  }
}
