package graft.sinks

import graft.SparkSpec
import graft.operators.{Similarity, TextIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Selective (per-partition) compaction — the delta-sized maintenance
  * contract: rewritten bytes are proportional to the DECAYED
  * partitions, never the store. Untouched partitions keep their exact
  * file paths and mtimes; sidecars reconcile to the new layout; serves
  * are bit-identical across the rewrite; a clean store is a no-op; and
  * the crash window between data swap and sidecar reconcile heals on
  * re-run. */
class SelectiveCompactSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/s"

  /** (relative path, mtime, length) of every data file under dir. */
  private def fileState(dir: String): Map[String, (Long, Long)] = {
    val fs = HadoopSwap.fs(spark, dir)
    SkippingStore.listDataFileRelPaths(spark, dir).map { rel =>
      val st = fs.getFileStatus(new Path(s"$dir/$rel"))
      rel -> (st.getModificationTime, st.getLen)
    }.toMap
  }

  private def buildStore(dir: String): Unit = {
    val base = (0L until 900L)
      .map(i => (i, (i % 3).toInt, s"v${i % 50}"))
      .toDF("id", "cat", "v")
    base.repartition(1).write.partitionBy("cat").mode("overwrite").parquet(dir)
    SkippingStore.indexPartitioned(spark, dir, Seq("id"))
    // decay ONLY cat=1: three single-partition appends
    (0 until 3).foreach { b =>
      (900L + b * 10 until 910L + b * 10)
        .map(i => (i, 1, s"v${i % 50}")).toDF("id", "cat", "v")
        .coalesce(1).write.partitionBy("cat").mode("append").parquet(dir)
      SkippingStore.indexPartitioned(spark, dir, Seq("id"))
    }
  }

  test("rewrites only decayed partitions; untouched files keep paths and mtimes") {
    val dir = tmpDir("selcomp")
    buildStore(dir)
    val beforeState = fileState(dir)
    val beforeRows = spark.read.parquet(dir)
      .collect().map(_.toString).sorted.toSeq
    val (rewritten, was, now) =
      SkippingStore.compactPartitionsSelective(spark, dir, "cat",
        maxFilesPerPartition = 2)
    assert(rewritten == Seq("cat=1"),
      s"only the appended partition may rewrite, got $rewritten")
    assert(now < was, s"decayed partition must shrink ($was -> $now)")
    val afterState = fileState(dir)
    val untouchedBefore = beforeState.filterNot(_._1.startsWith("cat=1/"))
    val untouchedAfter = afterState.filterNot(_._1.startsWith("cat=1/"))
    assert(untouchedAfter == untouchedBefore,
      "untouched partitions must keep exact paths, mtimes, and sizes")
    // rewritten bytes ∝ decayed partition, not store size
    val rewrittenBytes = afterState.collect {
      case (rel, (_, len)) if rel.startsWith("cat=1/") => len }.sum
    val storeBytes = afterState.values.map(_._2).sum
    assert(rewrittenBytes < storeBytes,
      "the rewrite must be smaller than the store")
    // answers identical; sidecar coverage reconciled (loud check passes)
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
      == beforeRows)
    assert(SkippingStore.loadMultiSidecar(spark, dir, relative = true).nonEmpty)
    val pruned = spark.read.parquet(dir).filter(col("id") === 905L)
    assert(pruned.count() == 1L &&
      graft.plans.PlanProbe.scannedFileCount(pruned) <
        SkippingStore.listDataFileRelPaths(spark, dir).size,
      "post-compact transparent zone pruning must still engage")
    // no scaffolding left behind
    val fs = HadoopSwap.fs(spark, dir)
    val leftovers = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(n => n.contains("selcompact") || n.contains(".rewrite-") ||
        n.contains(".old-"))
    assert(leftovers.isEmpty, s"scaffolding debris: ${leftovers.mkString(",")}")
  }

  test("clean store is a no-op; crash window heals on re-run") {
    val dir = tmpDir("selheal")
    buildStore(dir)
    SkippingStore.compactPartitionsSelective(spark, dir, "cat", 2)
    val cleanState = fileState(dir)
    val (r2, w2, n2) =
      SkippingStore.compactPartitionsSelective(spark, dir, "cat", 2)
    assert(r2.isEmpty && w2 == n2 && fileState(dir) == cleanState,
      "a second pass over a healed store must touch nothing")
    // simulate the crash window: a partition's data was swapped but the
    // sidecar reconcile never ran — fake it by appending a raw unmapped
    // file AND deleting a mapped one (phantom + unmapped, both drifts)
    val fs = HadoopSwap.fs(spark, dir)
    Seq((2000L, s"vX")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(s"$dir/cat=2")
    val mapped1 = SkippingStore.listDataFileRelPaths(spark, dir)
      .find(_.startsWith("cat=0/")).get
    fs.delete(new Path(s"$dir/$mapped1"), false)
    // the drifted sidecar must fail loud, not silently mis-prune
    intercept[IllegalArgumentException] {
      SkippingStore.loadMultiSidecar(spark, dir, relative = true)
    }
    // re-running selective compaction IS the heal
    SkippingStore.compactPartitionsSelective(spark, dir, "cat", 2)
    assert(SkippingStore.loadMultiSidecar(spark, dir, relative = true).nonEmpty,
      "re-run must reconcile the sidecar")
    assert(spark.read.parquet(dir).filter(col("id") === 2000L).count() == 1L,
      "healed store must serve the new file")
  }

  test("mid-swap crash (partition renamed aside, not yet replaced) restores, never destroys") {
    val dir = tmpDir("selswap")
    buildStore(dir)
    val beforeRows = spark.read.parquet(dir)
      .collect().map(_.toString).sorted.toSeq
    // simulate a crash INSIDE swapInto for cat=1: the live dir was
    // renamed to the aside root and the replacement never renamed in —
    // the partition's only copies now sit under the scaffolding roots
    val fs = HadoopSwap.fs(spark, dir)
    fs.mkdirs(new Path(s"$dir/_selcompact_old"))
    assert(fs.rename(new Path(s"$dir/cat=1"),
      new Path(s"$dir/_selcompact_old/cat=1")))
    // a half-written replacement under tmp (what the crashed run left)
    Seq((9999L, 1, "half")).toDF("id", "cat", "v").coalesce(1)
      .write.partitionBy("cat").mode("overwrite")
      .parquet(s"$dir/_selcompact_tmp")
    // the re-run heals: restores cat=1 from the aside copy, discards
    // the half replacement, re-compacts (cat=1 is still decayed), and
    // reconciles the sidecar — no row lost, no scaffolding left
    val (rewritten, _, _) =
      SkippingStore.compactPartitionsSelective(spark, dir, "cat", 2)
    assert(rewritten == Seq("cat=1"),
      s"the restored partition must re-compact, got $rewritten")
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
      == beforeRows, "the heal must restore every pre-crash row")
    assert(spark.read.parquet(dir).filter(col("v") === "half").count() == 0L,
      "the crashed run's half-written replacement must not leak in")
    val leftovers = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.contains("selcompact"))
    assert(leftovers.isEmpty, s"scaffolding debris: ${leftovers.mkString(",")}")
    assert(SkippingStore.loadMultiSidecar(spark, dir, relative = true).nonEmpty)
  }

  test("IVF wrapper: bit-identical serves, cold cells untouched") {
    val dir = tmpDir("selivf")
    val emb = (0L until 600L).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val ix = Similarity.trainIvf(emb.filter(col("vec_id") < 400),
      "vec_id", "embedding", 6)
    Similarity.ivfStoreBuild(emb.filter(col("vec_id") < 400).coalesce(1),
      "vec_id", "embedding", ix, dir)
    // hot-cell decay: three appends of near-duplicates of vector 1 —
    // every appended vector assigns into vector 1's cell
    val hot = (400L until 580L).map { i =>
      val v = Array.tabulate(8)(d =>
        (math.sin(31 + d * 7) + 1e-4 * (i % 7)).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    (0 until 3).foreach { b =>
      Similarity.ivfStoreAppend(
        hot.filter(col("vec_id") >= 400 + b * 60 &&
          col("vec_id") < 460 + b * 60).coalesce(1),
        "vec_id", "embedding", ix, dir)
    }
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    def serve() = Similarity.ivfStoreTopK(spark, dir, "vec_id", "embedding",
      qv, ix, k = 5, nprobe = 2).collect().toSeq
    val beforeServe = serve()
    val beforeState = fileState(dir)
    val (rewritten, was, now) =
      Similarity.compactIvfStoreSelective(spark, dir, maxFilesPerCell = 2)
    assert(rewritten.nonEmpty && rewritten.size < 6,
      s"appends must decay a strict subset of cells, got $rewritten")
    assert(now < was)
    val untouched = (c: ((String, (Long, Long)))) =>
      !rewritten.exists(r => c._1.startsWith(r + "/"))
    assert(fileState(dir).filter(untouched) == beforeState.filter(untouched),
      "cold cells must keep exact paths, mtimes, and sizes")
    assert(serve() == beforeServe, "serves must be bit-identical")
  }

  test("text wrapper: decayed buckets only; corpus stats and scores intact") {
    val dir = tmpDir("seltext")
    val docs = (0L until 200L).map(i =>
      (i, s"alpha beta gamma${i % 9} delta${i % 17} common"))
      .toDF("doc_id", "text")
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 6,
      filesPerBucket = 1)
    // term-skewed decay: three appends whose docs carry ONE hot term
    (0 until 3).foreach { b =>
      TextIndex.append(
        (300L + b * 10 until 310L + b * 10).map(i => (i, "zetahot"))
          .toDF("doc_id", "text"),
        "doc_id", "text", dir, filesPerBucket = 1)
    }
    def serve() = TextIndex.topK(spark, dir,
      Seq("alpha", "zetahot", "common"), 8).collect().toSeq
    val beforeServe = serve()
    val beforeState = fileState(dir)
    val (rewritten, was, now) =
      TextIndex.compactSelective(spark, dir, maxFilesPerBucket = 2)
    assert(rewritten.nonEmpty && rewritten.size < 6,
      s"one-term appends must decay a strict subset of buckets, got $rewritten")
    assert(now < was)
    val untouched = (c: ((String, (Long, Long)))) =>
      !rewritten.exists(r => c._1.startsWith(r + "/"))
    assert(fileState(dir).filter(untouched) == beforeState.filter(untouched),
      "cold buckets must keep exact paths, mtimes, and sizes")
    assert(serve() == beforeServe,
      "BM25 scores must be bit-identical across selective compaction")
  }
}
