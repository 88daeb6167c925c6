package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("append and overwrite commits; every version stays readable") {
    val dir = store("vstore")
    val v1 = VersionedStore.commit(Seq(1, 2, 3).toDF("n"), dir, 2)
    val v2 = VersionedStore.commit(Seq(4, 5).toDF("n"), dir, 2)
    val v3 = VersionedStore.commit(Seq(9).toDF("n"), dir, 1, overwrite = true)
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(VersionedStore.versions(spark, dir) == Seq(1L, 2L, 3L))
    // time travel: v1 and v2 resolve their own file sets after v3
    assert(VersionedStore.read(spark, dir, 1).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3))
    assert(VersionedStore.read(spark, dir, 2).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3, 4, 5))
    // overwrite replaced the logical content, latest is the default
    assert(VersionedStore.read(spark, dir).as[Int].collect().toSeq == Seq(9))
  }

  test("diff reports file-level adds and removes between versions") {
    val dir = store("vdiff")
    VersionedStore.commit(Seq(1).toDF("n"), dir, 1)
    VersionedStore.commit(Seq(2).toDF("n"), dir, 1)
    VersionedStore.commit(Seq(3).toDF("n"), dir, 1, overwrite = true)
    val d12 = VersionedStore.diff(spark, dir, 1, 2)
      .as[(String, String)].collect()
    assert(d12.length == 1 && d12.head._2 == "added")
    val d23 = VersionedStore.diff(spark, dir, 2, 3)
      .as[(String, String)].collect().groupBy(_._2).view.mapValues(_.length).toMap
    assert(d23 == Map("added" -> 1, "removed" -> 2))
  }

  test("vacuum drops old versions and their unreferenced files; reads fail loudly") {
    val dir = store("vvac")
    VersionedStore.commit(Seq(1, 2).toDF("n"), dir, 2)
    VersionedStore.commit(Seq(3).toDF("n"), dir, 1)
    VersionedStore.commit(Seq(7, 8).toDF("n"), dir, 2, overwrite = true)
    val (droppedV, deletedF) = VersionedStore.vacuum(spark, dir, keepLast = 1)
    assert(droppedV == 2 && deletedF == 3) // v1's 2 files + v2's extra 1
    assert(VersionedStore.versions(spark, dir) == Seq(3L))
    assert(VersionedStore.read(spark, dir).as[Int].collect().sorted.toSeq
      == Seq(7, 8))
    val e = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, dir, 1)
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("a stray temp manifest is not a committed version; empty store refuses") {
    val dir = store("vtmp")
    val e = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, dir)
    }
    assert(e.getMessage.contains("no committed versions"))
    VersionedStore.commit(Seq(1).toDF("n"), dir, 1)
    // simulate a crash mid-commit: a temp manifest left behind
    Seq("ghost").toDF("file").write.parquet(s"$dir/_versions/_tmp-crashed")
    assert(VersionedStore.versions(spark, dir) == Seq(1L))
    assert(VersionedStore.read(spark, dir).as[Int].collect().toSeq == Seq(1))
  }

  test("missing data file under a pinned version fails loudly, never drops rows") {
    val dir = store("vmiss")
    VersionedStore.commit(Seq(1, 2, 3, 4).toDF("n"), dir, 2)
    val f = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    assert(f.delete())
    val e = intercept[IllegalArgumentException] {
      VersionedStore.read(spark, dir, 1).count()
    }
    assert(e.getMessage.contains("missing data files"))
  }
}
