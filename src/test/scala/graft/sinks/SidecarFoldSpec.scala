package graft.sinks

import graft.SparkSpec
import graft.operators.{Curation, Dedup, Similarity, TextIndex}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Contracts of the sidecar fold-on-threshold maintenance
  * ([[SidecarFold]]): a high-churn store — hundreds of delete calls and
  * append batches between compactions — must keep every append-only
  * sidecar (`_tombstones`, `_doclen`, `_corpus_stats`) a BOUNDED read
  * (the 100 TB serve must never pay a churn-proportional small-file
  * listing+merge), answers must stay bit-identical through every fold,
  * and a fold that crashes between the swap's two renames must heal on
  * the next read — a tombstone sidecar parked under an aside name must
  * never read as "no deletes" (silent resurrection). */
class SidecarFoldSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_scf_$tag")
    d.toFile.deleteOnExit()
    d.resolve("store").toString
  }

  private def filesIn(dir: String): Int = {
    val fs = HadoopSwap.fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) 0
    else fs.listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  test("foldIfDecayed: threshold gate, idempotent rewrite, rows preserved") {
    val side = tmp("unit") + "/_tombstones"
    (1 to 3).foreach(i =>
      Seq((i.toLong, 10L)).toDF("doc_id", "dl")
        .coalesce(1).write.mode("append").parquet(side))
    // under threshold: no fold
    assert(!SidecarFold.foldIfDecayed(spark, side, 3)(identity))
    assert(filesIn(side) == 3)
    // over threshold: folds through the dedup rewrite, rows preserved
    assert(SidecarFold.foldIfDecayed(spark, side, 2)(
      _.groupBy($"doc_id").agg(max($"dl").as("dl"))))
    assert(filesIn(side) == 1, "fold must land byte-targeted few files")
    assert(spark.read.parquet(side).as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 10L), (3L, 10L)))
    // fresh dirs and healthy dirs: restoreAside is a no-op
    SidecarFold.restoreAside(spark, side)
    SidecarFold.restoreAside(spark, tmp("none") + "/_tombstones")
    assert(filesIn(side) == 1)
  }

  test("readers are heal-only: restore never deletes .fold scaffolding; non-numeric stamps are skipped, never a crash") {
    val side = tmp("healonly") + "/_tombstones"
    val fs = HadoopSwap.fs(spark, side)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    Seq((1L, 10L)).toDF("doc_id", "dl")
      .coalesce(1).write.parquet(side + ".old-777")
    Seq((2L, 10L)).toDF("doc_id", "dl")
      .coalesce(1).write.parquet(side + ".fold-888")
    // a foreign path matching the aside glob with a junk stamp must be
    // skipped (previously a NumberFormatException on every read)
    fs.mkdirs(p(side + ".old-junk"))
    SidecarFold.restoreAside(spark, side)
    assert(fs.exists(p(side)), "newest numeric .old aside restores")
    assert(spark.read.parquet(side).as[(Long, Long)].head() == ((1L, 10L)),
      ".old wins over .fold (verbatim history at rename-away instant)")
    assert(fs.exists(p(side + ".fold-888")),
      "a reader must never delete the maintainer's in-flight .fold")
    assert(fs.exists(p(side + ".old-junk")), "readers delete nothing")
    // the maintainer's next fold attempt clears the residue
    SidecarFold.foldIfDecayed(spark, side, 1000)(identity)
    assert(!fs.exists(p(side + ".fold-888")) &&
      !fs.exists(p(side + ".old-junk")),
      "scaffolding cleanup belongs to the maintainer")
    // only-junk asides: heal is a no-op, not a restore of foreign data
    val side2 = tmp("junkonly") + "/_tombstones"
    val fs2 = HadoopSwap.fs(spark, side2)
    fs2.mkdirs(p(side2 + ".old-junk"))
    SidecarFold.restoreAside(spark, side2)
    assert(!fs2.exists(p(side2)),
      "a junk-stamped foreign dir must never be renamed into the store")
  }

  test("high-churn text store: 100+ appends and 100+ deletes keep bounded sidecars; serves == rebuild; fold crash never resurrects") {
    val dir = tmp("textchurn")
    val mk = (i: Long) => Seq((i, s"alpha beta w$i")).toDF("doc_id", "text")
    TextIndex.build(mk(0L), "doc_id", "text", dir, nBuckets = 4)
    // 109 append calls + the build = 110 single-doc batches
    (1L to 109L).foreach(i => TextIndex.append(mk(i), "doc_id", "text", dir))
    // 100 single-id delete calls — each appends one tombstone file
    (0L until 100L).foreach(i =>
      assert(TextIndex.delete(spark, dir, Seq(i).toDF("doc_id"),
        "doc_id") == 1L))
    // every sidecar read stays bounded: folds rode the churn
    val dl = filesIn(s"$dir/_doclen")
    val tb = filesIn(s"$dir/_tombstones")
    val st = filesIn(s"$dir/_corpus_stats")
    val zm = filesIn(s"$dir/_zonemap_multi")
    assert(dl <= 70, s"_doclen must fold under churn ($dl files)")
    assert(tb <= 70, s"_tombstones must fold under churn ($tb files)")
    assert(st <= 70, s"_corpus_stats must fold under churn ($st files)")
    assert(zm <= 70, s"_zonemap_multi must fold under churn ($zm files)")
    // stats and serve are exactly a rebuild on the survivors
    assert(TextIndex.readStats(spark, dir)._1 == 10L)
    val survivors = (100L to 109L).map(i => (i, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    def serve() = TextIndex.topK(spark, dir, Seq("alpha", "w105"), 12)
      .select($"doc_id", $"n_terms", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    val want = Curation.bm25TopK(survivors, "doc_id", "text",
        Seq("alpha", "w105"), 12)
      .select($"doc_id", $"n_terms", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(serve() == want,
      "a churned store must serve the survivor rebuild's answer")
    // fold crash between swapInto's renames: the tombstone sidecar is
    // parked aside — the next read must restore it, never serve the
    // store as if nothing were deleted
    val fs = HadoopSwap.fs(spark, dir)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/_tombstones"),
      new org.apache.hadoop.fs.Path(s"$dir/_tombstones.old-777")))
    assert(serve() == want,
      "a fold-crash window must never resurrect tombstoned docs")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_tombstones")),
      "the read must have healed the sidecar back into place")
  }

  test("IVF store: 70 delete calls fold the tombstone sidecar; serves == survivor rebuild") {
    val rnd = new Random(3)
    val emb = (0L until 40L).map { i =>
      val center = (i % 4).toInt
      val v = Array.tabulate(8)(d =>
        (if (d % 4 == center) 1f else 0f) + (rnd.nextFloat() - 0.5f) * 0.2f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val dir = tmp("ivfchurn")
    val dirSurv = tmp("ivfsurv")
    val ix = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuild(emb, "vec_id", "embedding", ix, dir)
    // 70 single-id deletes: ids 0-9 real, 100-159 unknown (accepted,
    // they exclude nothing) — each call appends one tombstone file
    ((0L until 10L) ++ (100L until 160L)).foreach(i =>
      assert(Similarity.ivfStoreDelete(spark, dir,
        Seq(i).toDF("vec_id"), "vec_id") == 1L))
    val tb = filesIn(s"$dir/_tombstones")
    assert(tb <= 70, s"_tombstones must fold under churn ($tb files)")
    Similarity.ivfStoreBuild(emb.filter($"vec_id" >= 10L),
      "vec_id", "embedding", ix, dirSurv)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").as[Array[Float]].head().toSeq
    def serve(d: String) =
      Similarity.ivfStoreTopK(spark, d, "vec_id", "embedding", qv, ix,
        k = 8, nprobe = ix.cids.size, excludeId = Some(0L))
        .as[(Long, Double)].collect().toSeq
    assert(serve(dir) == serve(dirSurv),
      "a churned IVF store must serve the survivor rebuild's answer")
    // fold crash window: tombstones parked aside must heal on the
    // next serve, never read as "no deletes"
    val fs = HadoopSwap.fs(spark, dir)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/_tombstones"),
      new org.apache.hadoop.fs.Path(s"$dir/_tombstones.old-777")))
    assert(serve(dir) == serve(dirSurv),
      "a fold-crash window must never resurrect tombstoned vectors")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_tombstones")))
  }

  test("signature store: 70 delete calls fold the tombstone sidecar; live rows exact") {
    val docs = (0L until 50L)
      .map(i => (i, s"the quick brown fox ${i % 7} jumps over dog $i"))
      .toDF("doc_id", "text")
    val dir = tmp("sigchurn")
    val dupes = tmp("sigdupes")
    Dedup.ingestBatch(docs, "doc_id", "text", dir, dupes)
    ((0L until 10L) ++ (100L until 160L)).foreach(i =>
      assert(Dedup.signatureStoreDelete(spark, dir,
        Seq(i).toDF("doc_id"), "doc_id") == 1L))
    val tb = filesIn(s"$dir/_tombstones")
    assert(tb <= 70, s"_tombstones must fold under churn ($tb files)")
    assert(Dedup.readSignatureStore(spark, dir)
        .select($"doc_id").distinct().as[Long].collect().toSet ==
      (10L until 50L).toSet,
      "exactly the surviving docs' signatures remain visible")
    // fold crash window: tombstones parked aside must heal on the
    // next read, never resurrect the deleted docs' signatures
    val fs = HadoopSwap.fs(spark, dir)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/_tombstones"),
      new org.apache.hadoop.fs.Path(s"$dir/_tombstones.old-777")))
    assert(Dedup.readSignatureStore(spark, dir)
        .select($"doc_id").distinct().as[Long].collect().toSet ==
      (10L until 50L).toSet,
      "a fold-crash window must never resurrect tombstoned signatures")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_tombstones")))
  }
}
