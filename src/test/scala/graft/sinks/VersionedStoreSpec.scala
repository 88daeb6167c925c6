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

  test("rowDiff reads only the manifest delta; compaction moves cancel out") {
    val dir = store("vcdc")
    VersionedStore.commit(Seq(1, 2, 3).toDF("n"), dir, 2)
    VersionedStore.commit(Seq(4).toDF("n"), dir, 1)
    val d12 = VersionedStore.rowDiff(spark, dir, 1, 2)
      .as[(Int, String)].collect().toSet
    assert(d12 == Set((4, "added")))
    // "compaction": rewrite the same logical rows into new files
    VersionedStore.commit(Seq(1, 2, 3, 4).toDF("n"), dir, 1, overwrite = true)
    assert(VersionedStore.rowDiff(spark, dir, 2, 3).count() == 0,
      "rows that only moved between files must cancel")
    VersionedStore.commit(Seq(9).toDF("n"), dir, 1, overwrite = true)
    val d34 = VersionedStore.rowDiff(spark, dir, 3, 4)
      .as[(Int, String)].collect().toSet
    assert(d34 == Set((9, "added"), (1, "removed"), (2, "removed"),
      (3, "removed"), (4, "removed")))
    // identical versions diff to nothing
    assert(VersionedStore.rowDiff(spark, dir, 4, 4).count() == 0)
  }

  test("schema evolves only via overwrite; cross-schema rowDiff refuses") {
    val dir = store("vschema")
    VersionedStore.commit(Seq(1).toDF("n"), dir, 1)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commit(Seq(("a", 2)).toDF("s", "n"), dir, 1)
    }
    assert(e.getMessage.contains("overwrite to evolve"))
    VersionedStore.commit(Seq(("a", 2)).toDF("s", "n"), dir, 1, overwrite = true)
    // both versions readable, each under its own schema
    assert(VersionedStore.read(spark, dir, 1).columns.toSeq == Seq("n"))
    assert(VersionedStore.read(spark, dir, 2).columns.toSeq == Seq("s", "n"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedStore.rowDiff(spark, dir, 1, 2)
    }
    assert(e2.getMessage.contains("schema change"))
  }

  test("compactVersioned: manifest-route compaction, time travel intact, vacuum reclaims") {
    val dir = store("vcompact")
    // five append commits of 3 files each: the small-files decay shape
    for (b <- 0 until 5)
      VersionedStore.commit(
        Seq.tabulate(6)(i => b * 6 + i).toDF("n"), dir, 3)
    val vs = VersionedStore.versions(spark, dir)
    assert(vs.size == 5)
    val (cv, before, after) = VersionedStore.compactVersioned(spark, dir, 2)
    assert(cv == 6L && before == 15 && after == 2,
      s"15 accreted files must compact to 2 (got $before -> $after)")
    // identical rows, and the CDC view across the compaction is EMPTY
    // (moved rows cancel — compaction is invisible to row-level diff)
    assert(VersionedStore.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (0 until 30).toSeq)
    assert(VersionedStore.rowDiff(spark, dir, 5L, cv).count() == 0)
    // every pre-compaction version still time-travels
    assert(VersionedStore.read(spark, dir, 2).as[Int].collect().sorted.toSeq ==
      (0 until 12).toSeq)
    // no directory was renamed: the store root never stopped being the
    // same path, and vacuum now reclaims the superseded files
    val (dropped, deleted) = VersionedStore.vacuum(spark, dir, keepLast = 1)
    assert(dropped == 5 && deleted == 15,
      s"vacuum must drop the 5 old manifests and their 15 files ($dropped, $deleted)")
    assert(VersionedStore.read(spark, dir).as[Int].collect().sorted.toSeq ==
      (0 until 30).toSeq)
  }

  test("versioned streaming ingest: one tagged version per batch, replay-safe") {
    import graft.streaming.StreamingMerge
    val dir = store("ving")
    // direct-apply contract: commit, skip-on-replay, refuse on reset ids
    assert(StreamingMerge.applyVersionedBatch(Seq(1, 2).toDF("n"), 0L, dir, 1))
    assert(StreamingMerge.applyVersionedBatch(Seq(3).toDF("n"), 1L, dir, 1))
    assert(!StreamingMerge.applyVersionedBatch(Seq(3).toDF("n"), 1L, dir, 1),
      "replayed batch must skip")
    assert(VersionedStore.versions(spark, dir) == Seq(1L, 2L))
    assert(VersionedStore.lastTag(spark, dir).contains(1L))
    val e = intercept[IllegalStateException] {
      StreamingMerge.applyVersionedBatch(Seq(9).toDF("n"), 0L, dir, 1)
    }
    assert(e.getMessage.contains("lifetimes diverged"))
    assert(VersionedStore.read(spark, dir).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3))
    // history never reads data files: versions, file counts, tags
    assert(VersionedStore.history(spark, dir)
      .as[(Long, Long, Option[Long])].collect().toSeq
      == Seq((1L, 1L, Some(0L)), (2L, 2L, Some(1L))))
    // a real stream over the same gate
    val in = java.nio.file.Files.createTempDirectory("ving-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ving-ckpt").toString
    val sdir = store("ving2")
    val schema = Seq((1L, "a")).toDF("id", "v").schema
    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(in)
    val q = StreamingMerge.versionedIngest(spark, in, schema, sdir, ckpt, 1)
    q.processAllAvailable()
    Seq((2L, "b")).toDF("id", "v").write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    assert(VersionedStore.versions(spark, sdir).size == 2)
    assert(VersionedStore.read(spark, sdir).count() == 2)
    // snapshot pinning: version 1 still sees only the first batch
    assert(VersionedStore.read(spark, sdir, 1).count() == 1)
  }

  test("a commit records only its own staged files, not concurrent arrivals") {
    val dir = store("vconc")
    VersionedStore.commit(Seq(1, 2).toDF("n"), dir, 1)
    // a concurrent writer's file lands in the shared directory right
    // before this commit lists/writes: a directory-diff commit would
    // absorb it into the manifest and surface its rows twice after the
    // other committer retries — staged commits must not see it
    Seq(777).toDF("n").write.mode("append").parquet(dir)
    val v2 = VersionedStore.commit(Seq(3, 4).toDF("n"), dir, 1)
    assert(VersionedStore.read(spark, dir, v2).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3, 4), "the foreign file must not join the snapshot")
    // the foreign file is an orphan: vacuum reclaims it
    val (_, orphans) = VersionedStore.vacuum(spark, dir, keepLast = 2)
    assert(orphans == 1, "the concurrent arrival is swept as an orphan")
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

  test("a dir carrying _tombstones refuses versioned reads loud") {
    val dir = store("vtomb")
    VersionedStore.commit(Seq(1, 2, 3).toDF("n"), dir, 1)
    VersionedStore.commit(Seq(4, 5).toDF("n"), dir, 1)
    // a tombstoned-delete sidecar (the TextIndex/Similarity delete
    // discipline) landing in a versioned dir must not silently compose:
    // manifests know nothing about pending deletes
    Seq(2L).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_tombstones")
    val e1 = intercept[IllegalArgumentException](
      VersionedStore.read(spark, dir).count())
    assert(e1.getMessage.contains("_tombstones"))
    val e2 = intercept[IllegalArgumentException](
      VersionedStore.rowDiff(spark, dir, 1, 2).count())
    assert(e2.getMessage.contains("_tombstones"))
    // purging the sidecar restores service
    HadoopSwap.deleteRecursive(spark, s"$dir/_tombstones")
    assert(VersionedStore.read(spark, dir).count() == 5L)
  }
}
