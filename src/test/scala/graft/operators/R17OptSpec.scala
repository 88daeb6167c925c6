package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Round-17 optimization pins — every change here removed fixed-cost
  * jobs or passes, never rows, and each equality below is the proof:
  *
  *  - the observed-checkpoint bucket collection equals the explicit
  *    distinct+collect it replaced (non-empty AND empty frames);
  *  - the tombstone snapshot memo equals the per-call count+sum jobs
  *    it replaced, revalidating across delete/fold;
  *  - compaction's vocab-from-blockmax derivation equals the direct
  *    postings scan it replaced;
  *  - the bounded footer-read budget degrades to the exact data scan,
  *    bit-identically, instead of hanging the driver.
  */
class R17OptSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private lazy val docs = {
    val rnd = new Random(17)
    (0L until 80L).map { id =>
      val n = 5 + rnd.nextInt(8)
      (id, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"r17opt_$tag").toString
    new java.io.File(d).delete()
    d
  }

  test("checkpointWithBuckets equals the explicit distinct+collect " +
      "(observed path and empty-frame fallback)") {
    val frame = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .withColumn("tb", pmod(xxhash64(col("w")), lit(8)).cast("int"))
    val (cp, buckets) = TextIndex.checkpointWithBuckets(frame)
    val explicit = cp.select(col("tb")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(buckets == explicit,
      "observed bucket set must equal the job it replaced")
    assert(cp.count() == frame.count())
    // empty frame: AQE may swallow the metrics node entirely — the
    // helper must fall back to the explicit job and answer empty
    val (cpE, bucketsE) =
      TextIndex.checkpointWithBuckets(frame.filter(lit(false)))
    assert(bucketsE.isEmpty && cpE.count() == 0L)
  }

  test("tombstone snapshot equals the per-call aggregate through " +
      "delete, re-delete and fold; readStats tracks it") {
    val dir = tmp("tomb")
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4,
      filesPerBucket = 2)
    val (n0, sdl0, _) = TextIndex.readStats(spark, dir)
    assert(TextIndex.tombSnapshot(spark, dir).n == 0L)
    val del1 = docs.filter($"doc_id" % 5 === 0).select($"doc_id")
    assert(TextIndex.delete(spark, dir, del1, "doc_id") > 0L)
    val snap1 = TextIndex.tombSnapshot(spark, dir)
    // the aggregate the memo replaced, recomputed from the sidecar
    val raw1 = spark.read.parquet(s"$dir/_tombstones")
      .groupBy($"doc_id").agg(max($"dl").as("dl"))
      .agg(count(lit(1)), sum($"dl")).head()
    assert(snap1.n == raw1.getLong(0) && snap1.sdl == raw1.getLong(1))
    val (n1, sdl1, _) = TextIndex.readStats(spark, dir)
    assert(n1 == n0 - snap1.n && sdl1 == sdl0 - snap1.sdl)
    // a second delete changes the sidecar listing → snapshot re-reads
    val del2 = docs.filter($"doc_id" % 7 === 3).select($"doc_id")
    TextIndex.delete(spark, dir, del2, "doc_id")
    val snap2 = TextIndex.tombSnapshot(spark, dir)
    val raw2 = spark.read.parquet(s"$dir/_tombstones")
      .groupBy($"doc_id").agg(max($"dl").as("dl"))
      .agg(count(lit(1)), sum($"dl")).head()
    assert(snap2.n == raw2.getLong(0) && snap2.sdl == raw2.getLong(1))
    assert(snap2.n > snap1.n)
    // a re-delete of already-dead ids is a no-op for the snapshot
    TextIndex.delete(spark, dir, del1, "doc_id")
    assert(TextIndex.tombSnapshot(spark, dir).n == snap2.n)
  }

  test("compaction's vocab rebuild from the blockmax sidecar equals " +
      "the direct postings scan") {
    // two identical stores, one compacted with _blockmax present
    // (vocab derives from its rows), one with vocab only (direct
    // scan) — the rebuilt dictionaries must match row-for-row
    val withBm = tmp("vbm")
    val scanOnly = tmp("vscan")
    Seq(withBm, scanOnly).foreach { dir =>
      TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4,
        filesPerBucket = 2)
      TextIndex.buildVocab(spark, dir)
      TextIndex.append(docs.select($"doc_id" + 1000 as "doc_id",
        $"text"), "doc_id", "text", dir, filesPerBucket = 2)
      TextIndex.delete(spark, dir,
        docs.filter($"doc_id" % 6 === 0).select($"doc_id"), "doc_id")
    }
    TextIndex.buildBlockStats(spark, withBm)
    TextIndex.compact(spark, withBm, filesPerBucket = 2)
    TextIndex.compact(spark, scanOnly, filesPerBucket = 2)
    val a = TextIndex.vocabulary(spark, withBm)
      .orderBy($"w").collect().toSeq
    val b = TextIndex.vocabulary(spark, scanOnly)
      .orderBy($"w").collect().toSeq
    assert(a == b,
      "blockmax-derived vocab must equal the scan-derived vocab")
  }

  test("footer-read budget exhaustion degrades to the exact data " +
      "scan, bit-identically") {
    import graft.sinks.SkippingStore
    val fast = tmp("zfast")
    val slow = tmp("zslow")
    val post = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .withColumn("tb", pmod(xxhash64(col("w")), lit(4)).cast("int"))
    Seq(fast, slow).foreach { dir =>
      post.repartitionByRange(8, col("tb"), col("w"))
        .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
        .write.partitionBy("tb").parquet(dir)
    }
    SkippingStore.indexPartitioned(spark, fast, Seq("w"))
    val budget0 = SkippingStore.footerReadBudgetNanos
    try {
      SkippingStore.footerReadBudgetNanos = 0L // instant timeout
      SkippingStore.indexPartitioned(spark, slow, Seq("w"))
    } finally SkippingStore.footerReadBudgetNanos = budget0
    // part-file names differ only by write UUID across the two dirs;
    // normalize to (tb dir + part index) so rows compare 1:1
    def zs(dir: String) = spark.read.parquet(s"$dir/_zonemap_multi")
      .withColumn("file",
        regexp_extract($"file", "^(.*part-\\d+)", 1))
      .orderBy($"file", $"col").collect().toSeq
    assert(zs(fast) == zs(slow),
      "timeout fallback must produce identical rows")
  }
}
