package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Behavioral checks for the ANN family: IVF probes are a strict subset
  * of the corpus, nprobe monotonically improves recall vs the exact
  * cosine top-k baseline, and nprobe = numCells recovers it entirely.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic embeddings: 40 vectors in 4 loose clusters
  private lazy val emb = {
    val rnd = new Random(3)
    (0L until 40L).map { i =>
      val center = (i % 4).toInt
      val v = Array.tabulate(8)(d =>
        (if (d % 4 == center) 1f else 0f) + (rnd.nextFloat() - 0.5f) * 0.2f)
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select($"vec_id").as[Long].collect().toSeq

  test("IVF recall grows with nprobe and reaches exact at numCells") {
    val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)).toSet
    def recall(nprobe: Int): Double = {
      val got = ids(Similarity.ivfTopK(emb, "vec_id", "embedding",
        queryId = 0L, numCells = 4, k = 10, nprobe = nprobe)).toSet
      (got & exact).size.toDouble / exact.size
    }
    val r1 = recall(1); val r2 = recall(2); val r4 = recall(4)
    assert(r1 > 0.0, "probing the query's own cell must find same-cluster neighbors")
    assert(r2 >= r1 && r4 >= r2, s"recall must not degrade with nprobe: $r1 $r2 $r4")
    assert(r4 == 1.0, "probing every cell is the exact scan")
  }

  test("knnJoinIvf at full probe == exact knnJoin; recall grows with nprobe") {
    val corpus = emb.filter($"vec_id" >= 8)
    val queries = emb.filter($"vec_id" < 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"vec_id", $"sim")
        .as[(Long, Long, Double)].collect().toSet
    val exact = rows(Similarity.knnJoin(corpus, queries, "vec_id", "embedding", 5))
    val index = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    val full = rows(Similarity.knnJoinIvf(
      corpus, queries, "vec_id", "embedding", 5, index, nprobe = 4))
    assert(full == exact, "probing every cell must reproduce the exact join")
    def recall(nprobe: Int): Double = {
      val got = rows(Similarity.knnJoinIvf(
        corpus, queries, "vec_id", "embedding", 5, index, nprobe))
      (got.map(r => (r._1, r._2)) & exact.map(r => (r._1, r._2))).size.toDouble /
        exact.size
    }
    val r1 = recall(1); val r2 = recall(2)
    assert(r1 > 0.0 && r2 >= r1, s"recall must not degrade with nprobe: $r1 $r2")
  }

  test("ANN scatter-gather: full-nprobe sharded serves == exact kNN " +
      "over the union; per-shard codebooks; tombstones honored") {
    import org.apache.spark.sql.functions._
    def tmp(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_annsh_$tag")
      d.toFile.deleteOnExit()
      d.resolve("store").toString
    }
    // three shards, EACH trained on its own subset (own codebooks —
    // distances are absolute, so no cross-shard contract is needed)
    val shards = (0 until 3).map { i =>
      val out = tmp(s"s$i")
      val part = emb.filter($"vec_id" % 3 === i)
      val ix = Similarity.trainIvf(part, "vec_id", "embedding", 3)
      Similarity.ivfStoreBuild(part, "vec_id", "embedding", ix, out)
      (out, ix)
    }
    val full = shards.map(_._2.cids.size).max
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
    val exact = pairs(Similarity.cosineTopK(emb, "vec_id", "embedding",
      0L, 7))
    assert(pairs(Similarity.ivfStoreTopKSharded(spark, shards, "vec_id",
      "embedding", qv, k = 7, nprobe = full, excludeId = Some(0L))) ==
      exact, "full-probe scatter must equal exact kNN over the union")
    // recall does not degrade with nprobe, like the single store
    val e = exact.map(_._1).toSet
    def recall(np: Int) = (pairs(Similarity.ivfStoreTopKSharded(spark,
      shards, "vec_id", "embedding", qv, 7, np, Some(0L)))
      .map(_._1).toSet & e).size.toDouble / e.size
    val r1 = recall(1)
    assert(r1 > 0.0 && recall(2) >= r1)
    // batched scatter == the single-query loop, per query
    val queries = emb.filter($"vec_id".isin(0L, 5L, 9L))
    val batched = Similarity.knnJoinIvfStoreSharded(spark, shards,
        queries, "vec_id", "embedding", k = 7, nprobe = full)
      .select($"query_id", $"vec_id", $"sim")
      .as[(Long, Long, Double)].collect().toSeq
      .sortBy(t => (t._1, -t._3, t._2))
    val loop = Seq(0L, 5L, 9L).flatMap { q =>
      val v = emb.filter($"vec_id" === q)
        .select($"embedding").head().getSeq[Float](0)
      pairs(Similarity.ivfStoreTopKSharded(spark, shards, "vec_id",
        "embedding", v, 7, full, Some(q))).map(p => (q, p._1, p._2))
    }.sortBy(t => (t._1, -t._3, t._2))
    assert(batched == loop, "batched scatter must equal the loop")
    // a tombstoned vector never surfaces from any shard
    val victim = exact.head._1
    assert(Similarity.ivfStoreDelete(spark,
      shards((victim % 3).toInt)._1, Seq(victim).toDF("vec_id"),
      "vec_id") == 1L)
    val after = pairs(Similarity.ivfStoreTopKSharded(spark, shards,
      "vec_id", "embedding", qv, 7, full, Some(0L)))
    assert(!after.exists(_._1 == victim), "tombstoned vector surfaced")
    assert(after == pairs(Similarity.cosineTopK(
        emb.filter($"vec_id" =!= victim), "vec_id", "embedding", 0L, 7)),
      "post-delete scatter must equal exact kNN over the survivors")
  }

  test("knnJoinIvfStore == per-query ivfStoreTopK loop; scan prunes to the probed union") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("knnstore").toString + "/s"
    val index = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuild(emb, "vec_id", "embedding", index, dir)
    // one cluster's queries: the nprobe=1 union leaves cells unprobed
    val queries = emb.filter($"vec_id".isin(0L, 4L, 8L))
    for (nprobe <- Seq(1, 2, 4)) {
      val batched = Similarity.knnJoinIvfStore(spark, dir, queries,
        "vec_id", "embedding", k = 5, index = index, nprobe = nprobe)
        .as[(Long, Long, Double)].collect().toSet
      val looped = Seq(0L, 4L, 8L).flatMap { qid =>
        val qv = emb.filter($"vec_id" === qid)
          .select($"embedding").head().getSeq[Float](0)
        Similarity.ivfStoreTopK(spark, dir, "vec_id", "embedding", qv,
          index, k = 5, nprobe = nprobe, excludeId = Some(qid))
          .as[(Long, Double)].collect().map(r => (qid, r._1, r._2))
      }.toSet
      assert(batched == looped,
        s"batched serve must equal the per-query loop at nprobe=$nprobe")
    }
    // the store scan opens exactly the probed-cell union's files
    val probedCells = queries
      .select(explode(graft.functions.VectorFunctions.nearest_cells(
        $"embedding", index.cids, index.centroids, 1)).as("cell"))
      .distinct().as[Int].collect().toSet
    val fs = graft.sinks.HadoopSwap.fs(spark, dir)
    val unionFiles = probedCells.toSeq.map { c =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/cell=$c"))
        .count(s => s.getPath.getName.endsWith(".parquet"))
    }.sum
    val narrow = Similarity.knnJoinIvfStore(spark, dir, queries,
      "vec_id", "embedding", k = 5, index = index, nprobe = 1)
    assert(graft.plans.PlanProbe.scannedFileCount(narrow) == unionFiles,
      "the store scan must partition-prune to the union of probed cells")
    val allCells = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    assert(probedCells.size < allCells,
      "fixture must leave at least one unprobed cell for the prune to bite")
  }

  test("knnJoinIvfStore corpus sweep at full probe == exact knnJoin; no forced hint") {
    // the q218 shape: the query frame IS the corpus. This only scales
    // because the operator plans NO forced broadcast of the query side
    // (the r8 BroadcastAuditSpec finding) — the planner shuffles on
    // `cell` when the localCheckpoint's stats say the frame is big.
    val dir = java.nio.file.Files.createTempDirectory("knnsweep").toString + "/s"
    val index = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuild(emb, "vec_id", "embedding", index, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"vec_id", $"sim")
        .as[(Long, Long, Double)].collect().toSet
    val sweep = Similarity.knnJoinIvfStore(spark, dir, emb,
      "vec_id", "embedding", k = 5, index = index, nprobe = 4)
    val exact = rows(Similarity.knnJoin(emb, emb, "vec_id", "embedding", 5))
    assert(rows(sweep) == exact,
      "probing every cell must reproduce the exact all-pairs kNN join")
    val hints = sweep.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
        if h.hints.strategy.nonEmpty => h
    }
    assert(hints.isEmpty,
      "the batched serve must not force a join strategy — AQE decides " +
        "from the checkpointed query frame's real statistics")
  }

  test("clustered postings store: rider filter skips files inside probed cells") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("knnclust").toString + "/s"
    val withRider = emb.withColumn("bucket", ($"vec_id" % 5).cast("int"))
    val index = Similarity.trainIvf(withRider, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuildClustered(withRider, "vec_id", "embedding",
      index, dir, riderCols = Seq("bucket"), filesPerCell = 3)
    val qv = withRider.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    // the serve composes partition pruning (probed cells) with the
    // transparent rider-zone skip — no new reader API
    val res = Similarity.ivfStoreTopK(spark, dir, "vec_id", "embedding", qv,
      index, k = 5, nprobe = 2, excludeId = Some(0L),
      where = Some(col("bucket") === 2))
    // answers equal an UNCLUSTERED store's filtered serve bit-for-bit
    val plain = java.nio.file.Files.createTempDirectory("knnplain").toString + "/s"
    Similarity.ivfStoreBuild(withRider, "vec_id", "embedding", index, plain)
    val want = Similarity.ivfStoreTopK(spark, plain, "vec_id", "embedding", qv,
      index, k = 5, nprobe = 2, excludeId = Some(0L),
      where = Some(col("bucket") === 2))
    assert(res.as[(Long, Double)].collect().toSeq ==
      want.as[(Long, Double)].collect().toSeq)
    // and the scan proof: fewer files than the probed cells hold
    val probed = spark.range(1)
      .select(explode(graft.functions.VectorFunctions.nearest_cells(
        typedLit(qv), index.cids, index.centroids, 2)).as("cell"))
      .collect().map(_.getInt(0))
    val fs = graft.sinks.HadoopSwap.fs(spark, dir)
    val filesInProbed = probed.map { c =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/cell=$c"))
        .count(_.getPath.getName.endsWith(".parquet"))
    }.sum
    assert(filesInProbed > 2, s"fixture needs several files per cell ($filesInProbed)")
    val scanned = graft.plans.PlanProbe.scannedFileCount(res)
    assert(scanned < filesInProbed,
      s"rider-clustered serve must skip inside probed cells: $scanned of $filesInProbed")
  }

  test("IvfIndex round-trips through parquet; loaded index answers identically") {
    val index = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    Similarity.saveIndex(spark, index, path)
    val loaded = Similarity.loadIndex(spark, path)
    assert(loaded == index)
    val corpus = emb.filter($"vec_id" >= 8)
    val queries = emb.filter($"vec_id" < 8)
    def rows(ix: Similarity.IvfIndex) =
      Similarity.knnJoinIvf(corpus, queries, "vec_id", "embedding", 5, ix, 2)
        .as[(Long, Long, Double)].collect().toSet
    assert(rows(loaded) == rows(index))
  }

  test("annbuild/annquery lifecycle: build once, probe many, no retrain") {
    // the CLI verbs' exact call path: trainIvf+saveIndex once, then
    // loadIndex+ivfProbe per query — results identical to the
    // train-inside ivfTopK form at the same (cells, k, nprobe)
    val path = java.nio.file.Files.createTempDirectory("ann").toString + "/ix"
    Similarity.saveIndex(spark,
      Similarity.trainIvf(emb, "vec_id", "embedding", 4), path)
    val loaded = Similarity.loadIndex(spark, path)
    for (q <- Seq(0L, 7L)) { // query twice against the one artifact
      val probe = Similarity.ivfProbe(emb, "vec_id", "embedding", q, loaded,
        k = 5, nprobe = 2).as[(Long, Double)].collect().toSeq
      val trained = Similarity.ivfTopK(emb, "vec_id", "embedding", q,
        numCells = 4, k = 5, nprobe = 2).as[(Long, Double)].collect().toSeq
      assert(probe == trained)
    }
  }

  test("semanticDedup: reps survive, near-identical cell-mates flagged, one row per vector") {
    // plant an exact duplicate and a tiny-noise paraphrase of vector 0;
    // both land in 0's cell and score ~1.0 against its representative
    val withDups = emb.unionByName(Seq(
      (100L, Array.tabulate(8)(d => if (d % 4 == 0) 1f else 0f)),
      (101L, Array.tabulate(8)(d => (if (d % 4 == 0) 1f else 0f) + d * 1e-4f))
    ).toDF("vec_id", "embedding"))
    val index = Similarity.trainIvf(withDups, "vec_id", "embedding", 4)
    val out = Similarity.semanticDedup(withDups, "vec_id", "embedding", index, 0.98)
      .as[(Long, Int, Long, Double, Boolean)].collect()
    assert(out.length == 42, "exactly one row per input vector")
    // every cell's representative is its min id and is never flagged
    val byCell = out.groupBy(_._2)
    for ((_, rows) <- byCell) {
      val rep = rows.map(_._1).min
      assert(rows.forall(_._3 == rep))
      val repRow = rows.find(_._1 == rep).get
      assert(repRow._4 == 1.0 && !repRow._5, "rep scores 1.0 vs itself, survives")
    }
    val flagged = out.filter(_._5).map(_._1).toSet
    assert(Set(100L, 101L).subsetOf(flagged), s"planted near-dups flagged: $flagged")
    // flagging is exactly the threshold predicate on the emitted sim
    assert(out.forall(r => r._5 == (r._1 != r._3 && r._4 >= 0.98)))
  }

  test("trainIvf centroids are reproducible and assignment covers the corpus") {
    val a = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    val b = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    assert(a == b) // deterministic Lloyd step, rounded means
    assert(a.cids == a.cids.sorted && a.cids.distinct.size == a.cids.size)
    assert(a.centroids.forall(_.size == 8))
  }

  test("PQ: codes are bounded, encode is deterministic") {
    val df = emb.toDF("vec_id", "embedding")
    val idx = Similarity.trainPq(df, "vec_id", "embedding", m = 2, k = 4)
    assert(idx.subDim == 4 && idx.codebooks.size == 2)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", idx).collect()
    assert(codes.length == 40)
    assert(codes.forall(r => (1 to 2).forall(j =>
      r.getInt(j) >= 0 && r.getInt(j) < 4)))
    val again = Similarity.pqEncode(df, "vec_id", "embedding", idx).collect()
    assert(codes.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("PQ ADC equals exact squared-L2 ranking when codebooks are lossless") {
    // 4 vectors whose subvectors are all distinct and all in the init
    // set (vec_id < k): the Lloyd step leaves each subvector as its own
    // centroid, codes are lossless, so ADC == exact L2² and the ranking
    // matches brute force.
    val vs = Seq(
      (0L, Array(0f, 0f, 1f, 1f)),
      (1L, Array(0f, 1f, 1f, 2f)), // d2 to q=0: 1 + 1 = 2
      (2L, Array(2f, 0f, 1f, 5f)), // d2: 4 + 16 = 20
      (3L, Array(0f, 3f, 9f, 1f))) // d2: 9 + 64 = 73
    val df = vs.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(df, "vec_id", "embedding",
      queryId = 0L, m = 2, k = 4, topK = 3)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2.0), (2L, 20.0), (3L, 73.0)))
    // IVF-PQ with a full probe over lossless codebooks degrades to the
    // same exact ranking; a 1-cell probe returns a ranked subset of it
    val full = Similarity.ivfPqTopK(df, "vec_id", "embedding",
      queryId = 0L, numCells = 4, m = 2, k = 4, topK = 3, nprobe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(full == got)
    val pruned = Similarity.ivfPqTopK(df, "vec_id", "embedding",
      queryId = 0L, numCells = 4, m = 2, k = 4, topK = 3, nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    assert(pruned.toSet.subsetOf(got.toSet) &&
      pruned == pruned.sortBy(p => (p._2, p._1)))
  }

  test("recallAtK: full-probe IVF scores 1.0, misses score fractionally") {
    val df = emb.toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", 0L, 5)
      .withColumn("query_id", org.apache.spark.sql.functions.lit(0L))
    val full = Similarity.ivfTopK(df, "vec_id", "embedding", 0L,
      numCells = 4, k = 5, nprobe = 4)
      .withColumn("query_id", org.apache.spark.sql.functions.lit(0L))
    val r = Similarity.recallAtK(full, exact, "query_id", "vec_id")
      .as[(Long, Double)].collect().toMap
    assert(r(0L) == 1.0) // full probe degrades to exact
    // an empty approximate list scores 0, not null
    val none = Similarity.recallAtK(full.limit(0), exact, "query_id", "vec_id")
      .as[(Long, Double)].collect().toMap
    assert(none(0L) == 0.0)
  }

  test("PQ ADC survives gapped codebook cids (empty init cell dropped)") {
    // v0 and v1 share the subspace-0 value, so the argmin tie sends both
    // to cid 0 and init cell 1 attracts nothing: trainIvf returns cids
    // [0, 2] with a gap. Codes are cid VALUES — the ADC lookup must key
    // by cid, not position, or v2's code (2) reads past a 2-entry table.
    val vs = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 5f)), // d2 to q=0: 0 + 25 = 25
      (2L, Array(4f, 2f)), // d2: 9 + 4 = 13
      (3L, Array(1f, 2f))) // d2: 0 + 4 = 4
    val df = vs.toDF("vec_id", "embedding")
    val idx = Similarity.trainPq(df, "vec_id", "embedding", m = 2, k = 3)
    assert(idx.codebooks.head.cids == Seq(0, 2)) // the gap is real
    val got = Similarity.pqTopK(df, "vec_id", "embedding",
      queryId = 0L, m = 2, k = 3, topK = 3)
      .as[(Long, Double)].collect().toSeq
    // codebooks are still lossless (identical subvectors share a cell),
    // so ADC equals exact squared L2 — and contains no nulls
    assert(got == Seq((3L, 4.0), (2L, 13.0), (1L, 25.0)))
  }

  test("PQ index round-trips through parquet; probe equals in-memory ranking") {
    val df = emb.toDF("vec_id", "embedding")
    val trained = Similarity.trainPq(df, "vec_id", "embedding", m = 2, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("pqindex").toString
    Similarity.savePqIndex(spark, trained, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    assert(loaded == trained)
    val direct = Similarity.pqTopK(df, "vec_id", "embedding", 0L, 2, 4, 5)
      .as[(Long, Double)].collect().toSeq
    val served = Similarity.pqProbe(df, "vec_id", "embedding", 0L, loaded, 5)
      .as[(Long, Double)].collect().toSeq
    assert(served == direct)
  }

  test("knnJoinSeedBroadcast is bit-identical to knnJoin; broadcast side is the corpus") {
    val corpus = emb.filter($"vec_id" < 8)    // the small seed side
    val queries = emb.filter($"vec_id" >= 8)  // the big streamed side
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"vec_id", $"sim")
        .as[(Long, Long, Double)].collect().toSet
    val viaQueryBcast = rows(Similarity.knnJoin(corpus, queries, "vec_id", "embedding", 3))
    val swapped = Similarity.knnJoinSeedBroadcast(corpus, queries, "vec_id", "embedding", 3)
    assert(rows(swapped) == viaQueryBcast,
      "swapping the physical build side must not change a single row")
    // the scale claim, asserted in-plan: every broadcast exchange feeds
    // the CORPUS (cand_id/cv) side; the query stream never broadcasts
    val bcasts = graft.PlanAudit.broadcastOutputs(swapped.queryExecution.executedPlan)
    assert(bcasts.nonEmpty, "expected a broadcast of the seed/corpus side")
    for (names <- bcasts) {
      assert(names.contains("cand_id") && !names.contains("query_id"),
        s"broadcast side must be the corpus frame, got columns $names")
    }
  }

  test("knnClassify broadcasts only the labeled seed frame (r6 scale-killer inverted)") {
    val labeled = emb.filter($"vec_id" < 8)
      .withColumn("label", ($"vec_id" % 4).cast("int"))
    val unlabeled = emb.filter($"vec_id" >= 8)
    val out = Similarity.knnClassify(labeled, unlabeled,
      "vec_id", "embedding", "label", k = 3)
    // every broadcast in the plan carries seed-side columns only —
    // (cand_id, cv) from the neighbor join or (vec_id, label) from the
    // vote join; the unlabeled corpus (query_id/qv) never broadcasts
    val bcasts = graft.PlanAudit.broadcastOutputs(out.queryExecution.executedPlan)
    assert(bcasts.nonEmpty)
    for (names <- bcasts) {
      assert(!names.contains("query_id") && !names.contains("qv"),
        s"corpus-side columns reached a broadcast: $names")
      assert(names.subsetOf(Set("cand_id", "cv", "vec_id", "label")),
        s"unexpected broadcast frame: $names")
    }
    // predictions exist for every unlabeled vector, votes bounded by k
    val got = out.as[(Long, Int, Long)].collect()
    assert(got.length == 32 && got.forall(r => r._3 >= 1 && r._3 <= 3))
  }

  test("mrlTopK re-ranks ONLY the stage-one shortlist at full dimension") {
    // v3 is the GLOBAL full-dim winner but its 2-dim prefix is
    // orthogonal to the query, so a shortlist of 2 excludes it — if the
    // full-dim pass touched anything beyond the shortlist, v3 would win
    val vs = Seq(
      (0L, Array(1f, 0f, 10f, 0f)), // query
      (1L, Array(1f, 0f, 0f, 0f)),  // prefix cos 1.0, full ~0.0995
      (2L, Array(1f, 1f, 0f, 0f)),  // prefix cos ~0.707, full ~0.0704
      (3L, Array(0f, 1f, 10f, 0f))  // prefix cos 0.0, full ~0.990
    ).toDF("vec_id", "embedding")
    val globalTop = Similarity.cosineTopK(vs, "vec_id", "embedding", 0L, 1)
      .as[(Long, Double)].collect().head
    assert(globalTop._1 == 3L, "sanity: v3 is the exact full-dim winner")
    val two = Similarity.mrlTopK(vs, "vec_id", "embedding",
      queryId = 0L, prefixDims = 2, shortlist = 2, k = 2)
      .as[(Long, Double)].collect().toSeq
    assert(two.map(_._1) == Seq(1L, 2L),
      s"only shortlist rows may be scored at full dim, got $two")
    // full-dim sims, not prefix sims, decide the final order
    assert(two.forall { case (id, sim) =>
      val exact = Similarity.cosineTopK(vs, "vec_id", "embedding", 0L, 3)
        .as[(Long, Double)].collect().toMap
      sim == exact(id)
    })
    // a corpus-wide shortlist at full prefix degrades to the exact scan
    val degraded = Similarity.mrlTopK(vs, "vec_id", "embedding",
      queryId = 0L, prefixDims = 4, shortlist = 3, k = 3)
      .as[(Long, Double)].collect().toSeq
    val exact3 = Similarity.cosineTopK(vs, "vec_id", "embedding", 0L, 3)
      .as[(Long, Double)].collect().toSeq
    assert(degraded == exact3)
  }

  test("truncateNormalize: unit norm, zero/null vectors unrankable") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(3f, 4f, 0f, 5f)),
      (2L, Array(0f, 0f, 0f, 0f)), // zero prefix -> null
      (3L, Array(-1f, 2f, 9f, 9f))).toDF("vec_id", "embedding")
    val got = Similarity.truncateNormalize(emb, "embedding", 2)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_ => r.getSeq[Double](1)))
      .toMap
    assert(got(2L).isEmpty)
    for (id <- Seq(1L, 3L); v = got(id).get) {
      assert(v.length == 2)
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-5, s"norm of $v")
    }
    // 3-4-5 prefix: exactly (0.6, 0.8)
    assert(got(1L).get == Seq(0.6, 0.8))
  }

  test("trainIvfIterated: objective non-increasing, fixpoint reached, 1 iter == trainIvf") {
    import org.apache.spark.sql.functions.col
    val data = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def objective(ix: Similarity.IvfIndex): Double = {
      def d2(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      data.map { case (_, v) => ix.centroids.map(c => d2(v, c)).min }.sum / data.length
    }
    val one = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    val oneIt = Similarity.trainIvfIterated(emb, "vec_id", "embedding", 4, 1)
    assert(oneIt.cids == one.cids && oneIt.centroids == one.centroids)
    val objs = (1 to 6).map(i =>
      objective(Similarity.trainIvfIterated(emb, "vec_id", "embedding", 4, i)))
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective must not increase: $objs")
    }
    // the clustered fixture converges quickly: later rounds are a fixpoint
    assert(objs(4) == objs(5), s"fixpoint not reached: $objs")
  }

  test("hardNegatives: closest candidates strictly below the positive band") {
    import org.apache.spark.sql.functions.{col, broadcast => _}
    val anchors = emb.filter(col("vec_id") < 2)
    val corpus = emb.filter(col("vec_id") >= 2)
    val thr = 0.8
    val got = Similarity.hardNegatives(corpus, anchors,
      "vec_id", "embedding", thr, 3)
      .as[(Long, Long, Double)].collect()
    assert(got.forall(_._3 < thr), "a hard negative must sit below the band")
    // brute force from the plain knnJoin with a post-filter: same rows
    val want = Similarity.knnJoin(corpus, anchors, "vec_id", "embedding", 1000)
      .filter(col("sim") < thr)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).toSeq
      }.toSet
    assert(got.toSet == want && got.nonEmpty)
    // near-dup cluster mates (sim >= thr) were genuinely excluded
    val all = Similarity.knnJoin(corpus, anchors, "vec_id", "embedding", 1000)
      .as[(Long, Long, Double)].collect()
    assert(all.exists(_._3 >= thr), "fixture must contain near-positives to exclude")
  }

  test("ivfStoreDelete: serves == a store built on the survivors; batched serve agrees") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfdel")
      .resolve("store").toString
    val dirSurv = java.nio.file.Files.createTempDirectory("graft_ivfdelsurv")
      .resolve("store").toString
    val ix = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuild(emb, "vec_id", "embedding", ix, dir)
    val doomed = Seq(2L, 9L, 17L, 999L).toDF("vec_id") // 999 unknown
    assert(Similarity.ivfStoreDelete(spark, dir, doomed, "vec_id") == 4L,
      "unknown ids are accepted (no stats to skew) but deduped")
    assert(Similarity.ivfStoreDelete(spark, dir, doomed, "vec_id") == 0L,
      "re-delete must be a no-op")
    Similarity.ivfStoreBuild(emb.filter(!$"vec_id".isin(2L, 9L, 17L)),
      "vec_id", "embedding", ix, dirSurv)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").as[Array[Float]].head().toSeq
    def serve(d: String) =
      Similarity.ivfStoreTopK(spark, d, "vec_id", "embedding", qv, ix,
        k = 8, nprobe = ix.cids.size, excludeId = Some(0L))
        .as[(Long, Double)].collect().toSeq
    assert(serve(dir) == serve(dirSurv),
      "a deleted store must serve exactly a rebuild on the survivors")
    // the batched serve anti-joins the same tombstones
    val queries = emb.filter($"vec_id" < 3L)
    def batched(d: String) =
      Similarity.knnJoinIvfStore(spark, d, queries, "vec_id", "embedding",
        k = 5, ix, nprobe = ix.cids.size)
        .collect().map(_.toSeq).toSeq
    assert(batched(dir) == batched(dirSurv),
      "the batched serve must agree on a deleted store")
  }

  test("ivfStore tombstones: selective compaction keeps them, full compaction purges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpurge")
      .resolve("store").toString
    val ix = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuild(emb.filter($"vec_id" < 30L),
      "vec_id", "embedding", ix, dir)
    Similarity.ivfStoreAppend(emb.filter($"vec_id" >= 30L),
      "vec_id", "embedding", ix, dir)
    Similarity.ivfStoreDelete(spark, dir, Seq(5L, 6L).toDF("vec_id"),
      "vec_id")
    // appends must refuse tombstoned ids — the pending tombstone would
    // silently mask the new rows
    assertThrows[IllegalArgumentException](Similarity.ivfStoreAppend(
      emb.filter($"vec_id" === 5L), "vec_id", "embedding", ix, dir))
    val qv = emb.filter($"vec_id" === 1L)
      .select($"embedding").as[Array[Float]].head().toSeq
    // k = 12 comfortably covers the query's whole home cluster, so the
    // resurrected in-cluster id 5 must reappear after the final append
    def serve() =
      Similarity.ivfStoreTopK(spark, dir, "vec_id", "embedding", qv, ix,
        k = 12, nprobe = ix.cids.size, excludeId = Some(1L))
        .as[(Long, Double)].collect().toSeq
    val first = serve()
    assert(!first.exists(r => r._1 == 5L || r._1 == 6L))
    // selective compaction heals decay but does NOT purge: tombstones
    // survive and keep masking
    Similarity.compactIvfStoreSelective(spark, dir, maxFilesPerCell = 1)
    assert(graft.sinks.HadoopSwap.exists(spark, s"$dir/_tombstones"),
      "selective compaction must leave the tombstones in place")
    assert(serve() == first, "serves are bit-identical across it")
    // full compaction purges physically and clears the sidecar
    Similarity.compactIvfStore(spark, dir)
    assert(!graft.sinks.HadoopSwap.exists(spark, s"$dir/_tombstones"))
    assert(spark.read.parquet(dir).filter($"vec_id".isin(5L, 6L))
      .limit(1).count() == 0L, "purged rows must be physically gone")
    assert(serve() == first, "the purge must serve bit-identically")
    // the cleared store accepts the previously-refused id again
    Similarity.ivfStoreAppend(emb.filter($"vec_id" === 5L),
      "vec_id", "embedding", ix, dir)
    assert(serve().exists(_._1 == 5L),
      "a resurrected id must be servable after the purge")
  }

  test("SQ8 store serve honors tombstones — a delete is never silently ignored") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8del")
      .resolve("store").toString
    val ix = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfSq8StoreBuild(emb, "vec_id", "embedding", ix, dir)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").as[Array[Float]].head().toSeq
    def serve() = Similarity.ivfSq8StoreTopK(spark, dir, "vec_id", qv, ix,
      k = 12, nprobe = ix.cids.size, excludeId = Some(0L))
      .as[(Long, Double)].collect().toSeq
    val before = serve()
    val victims = before.take(2).map(_._1)
    Similarity.ivfStoreDelete(spark, dir, victims.toDF("vec_id"), "vec_id")
    val after = serve()
    assert(victims.forall(v => !after.exists(_._1 == v)),
      "tombstoned ids must vanish from the SQ8 serve")
    assert(after == before.filterNot(r => victims.contains(r._1)) ||
      after.size == 12,
      "survivors keep their order; the tail refills from the next ranks")
  }

  test("ivfStore tombstone id-column mismatch fails loud, never a skipped filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfmis")
      .resolve("store").toString
    val ix = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuild(emb, "vec_id", "embedding", ix, dir)
    Similarity.ivfStoreDelete(spark, dir, Seq(3L).toDF("vec_id"), "vec_id")
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").as[Array[Float]].head().toSeq
    assertThrows[IllegalArgumentException](
      Similarity.ivfStoreDelete(spark, dir,
        Seq(4L).toDF("other_id"), "other_id"))
    val renamed = emb.withColumnRenamed("vec_id", "other_id")
    assertThrows[IllegalArgumentException](
      Similarity.knnJoinIvfStore(spark, dir, renamed.limit(1),
        "other_id", "embedding", 3, ix, nprobe = 1).collect())
    // the append's clash check must fail the same way, never silently
    // rename the batch's id column into the tombstone's id space
    assertThrows[IllegalArgumentException](
      Similarity.ivfStoreAppend(
        renamed.filter($"other_id" >= 40L && $"other_id" < 42L),
        "other_id", "embedding", ix, dir))
  }

  test("ndcgAtK: perfect ranking scores 1, no positives scores 0, order matters") {
    // q1: perfect (system order == ideal); q2: worst order of the same
    // docs; q3: no positive qrels at all
    val results = Seq(
      (1L, 10L, 3.0), (1L, 11L, 2.0), (1L, 12L, 1.0),
      (2L, 10L, 1.0), (2L, 11L, 2.0), (2L, 12L, 3.0),
      (3L, 10L, 3.0), (3L, 11L, 2.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq(
      (1L, 10L, 2), (1L, 11L, 1), (1L, 12L, 0),
      (2L, 10L, 2), (2L, 11L, 1), (2L, 12L, 0),
      (3L, 10L, 0), (3L, 11L, 0))
      .toDF("query_id", "doc_id", "rel")
    val out = Similarity.ndcgAtK(results, qrels, "query_id", "doc_id",
        "score", "rel", k = 3)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0, s"ideal order must score 1.0, got ${out(1L)}")
    assert(out(3L) == 0.0, "a query with no positives must score 0")
    // worst order: rel-1 doc at rank 2, rel-2 doc at rank 3 of the
    // same judged set — strictly below 1
    assert(out(2L) > 0.0 && out(2L) < 1.0, s"got ${out(2L)}")
    // hand value: dcg = 0/log2(2) + 1/log2(3) + 3/log2(4) rounded
    // per-term; idcg = 3/log2(2) + 1/log2(3)
    val dcg = BigDecimal((math.pow(2, 1) - 1) / (math.log(3) / math.log(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal((math.pow(2, 2) - 1) / (math.log(4) / math.log(2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val idcg = BigDecimal(3.0).setScale(6) +
      BigDecimal(1.0 / (math.log(3) / math.log(2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val want = BigDecimal(dcg.toDouble / idcg.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L) == want, s"got ${out(2L)}, want $want")
  }

  test("mrrAtK: first relevant rank, misses score 0, cut at k") {
    val results = Seq(
      (1L, 10L, 3.0), (1L, 11L, 2.0), (1L, 12L, 1.0),
      (2L, 10L, 3.0), (2L, 11L, 2.0), (2L, 12L, 1.0),
      (3L, 10L, 3.0), (3L, 11L, 2.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq(
      (1L, 11L, 1),            // first (and only) hit at rank 2
      (2L, 12L, 1),            // hit at rank 3 — outside k=2
      (3L, 99L, 1))            // relevant doc never retrieved
      .toDF("query_id", "doc_id", "rel")
    val out = Similarity.mrrAtK(results, qrels, "query_id", "doc_id",
        "score", "rel", k = 2)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 0.5, 2L -> 0.0, 3L -> 0.0), out.toString)
  }

  test("rrfFuseBatch == per-query rrfFuse, query by query") {
    val rnd = new scala.util.Random(7)
    // two legs per query, overlapping doc sets, deliberate score ties
    def leg(qids: Seq[Long], seed: Int) = qids.flatMap { q =>
      (0 until 12).map(i =>
        (q, (rnd.nextInt(20)).toLong, (rnd.nextInt(6) / 2.0)))
    }.distinct.toDF("query_id", "doc_id", "score")
      .groupBy($"query_id", $"doc_id")
      .agg(org.apache.spark.sql.functions.max($"score").as("score"))
    val qids = Seq(1L, 2L, 3L)
    val legA = leg(qids, 1).cache()
    val legB = leg(qids, 2).cache()
    val batched = Similarity.rrfFuseBatch(Seq(legA, legB), "doc_id",
        c = 60, k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    val looped = qids.flatMap { q =>
      Similarity.rrfFuse(
        Seq(legA.filter($"query_id" === q).drop("query_id"),
          legB.filter($"query_id" === q).drop("query_id")),
        "doc_id", c = 60, k = 5)
        .as[(Long, Double)].collect().toSeq.map(r => (q, r._1, r._2))
    }
    assert(batched == looped,
      "the batched fusion must equal the per-query loop, bit for bit")
    assert(batched.nonEmpty && batched.map(_._1).distinct == qids)
  }
}
