package graft.operators

import graft.SparkSpec
import graft.streaming.StreamingMerge
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join (skew-safe path)") {
    val facts = Seq.tabulate(100)(i => (if (i < 90) "hot" else s"k$i", i))
      .toDF("key", "v")
    val dims = Seq(("hot", "H"), ("k95", "K")).toDF("key", "label")
    val plain = facts.join(dims, Seq("key"))
      .select($"key", $"v", $"label").as[(String, Int, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(facts, dims, "key", 8, $"v")
      .select($"key", $"v", $"label").as[(String, Int, String)].collect().toSet
    assert(salted == plain && plain.size == 91)
  }

  test("Profile counts nulls/distincts per column in one pass, both modes") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), Some("b")), (Some(3), None),
      (None, Some("b")), (None, Some("c"))).toDF("n", "s")
    val p = Profile.profile(df, Seq("n", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = p("n")
    assert(n.getLong(1) == 5 && n.getLong(2) == 2 && n.getLong(3) == 2)
    assert(n.getDouble(4) == 1.0 && n.getDouble(5) == 3.0)
    assert(n.isNullAt(6) && n.isNullAt(7))
    val sRow = p("s")
    assert(sRow.getLong(1) == 5 && sRow.getLong(2) == 1 && sRow.getLong(3) == 3)
    assert(sRow.isNullAt(4) && sRow.isNullAt(5))
    assert(sRow.getString(6) == "a" && sRow.getString(7) == "c")
    // approx mode: identical schema, sketch-based distinct (exact at
    // these cardinalities), no Expand in the plan
    val approx = Profile.profile(df, Seq("n", "s"), exact = false)
    assert(approx.schema == Profile.profile(df, Seq("n", "s")).schema)
    assert(!approx.queryExecution.sparkPlan.toString.contains("Expand"))
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == Map("n" -> 2L, "s" -> 3L))
  }

  test("salted two-phase count equals the plain count") {
    val df = Seq.fill(500)("hot").map(k => (k, 1)).toDF("key", "v")
      .unionByName(Seq(("cold", 1)).toDF("key", "v"))
    val got = SkewJoin.saltedCount(df, "key", 16, monotonically_increasing_id())
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 500L, "cold" -> 1L))
  }

  test("Sessionize.assign groups like Spark's native session_window") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"ts")
    // native gap-based session windows (30 min), counted per user
    val native = events
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .count()
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    // the window-based operator with the same 30-minute gap (micros)
    val viaOp = Sessionize.assign(events,
        Seq($"user_id"), Seq($"ts"),
        graft.queries.Relational.epochUs($"ts"), 30L * 60 * 1000 * 1000)
      .groupBy($"user_id").agg(countDistinct($"session_id").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(native == viaOp && native.nonEmpty)
  }

  test("approx_count_distinct tracks exact NDV within its error bound") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val toks = docs.select(explode(split($"text", "\\s+")).as("w"))
    val (approx, exact) = toks
      .agg(approx_count_distinct($"w", 0.02).as("a"), countDistinct($"w").as("e"))
      .as[(Long, Long)].head()
    // rsd 0.02 -> generous 10% assertion bound; the point is the sketch
    // path exists for 100 TB NDV where exact distinct is a full shuffle
    assert(math.abs(approx - exact).toDouble / exact < 0.10, s"$approx vs $exact")
  }

  test("store schema evolution: mergeSchema unions old and new columns") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(dir)
    // a later writer adds a column; old files stay untouched
    Seq((2L, "b", "extra")).toDF("id", "v", "note")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "note", "v"))
    val rows = merged.select($"id", $"v", $"note")
      .as[(Long, String, Option[String])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some("extra"))))
  }

  test("store compaction shrinks file count, preserves data; expire drops by TTL") {
    import graft.sinks.StoreMaintenance
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val rows = (0L until 5000L).map(i =>
      (i, s"2024-01-${"%02d".format((i % 28) + 1)}", s"payload-$i"))
      .toDF("id", "day", "v")
    rows.repartition(40).write.mode("overwrite").parquet(dir)
    val before = rows.collect().toSet
    val (nBefore, nAfter) = StoreMaintenance.compact(spark, dir, 512 * 1024)
    assert(nBefore == 40 && nAfter < 40)
    assert(spark.read.parquet(dir).collect().toSet == before)
    val dropped = StoreMaintenance.expire(spark, dir, "day", "2024-01-15")
    val left = spark.read.parquet(dir)
    assert(dropped > 0 && left.count() + dropped == 5000L)
    assert(left.agg(min($"day")).head().getString(0) >= "2024-01-15")
  }

  test("closure prune set is live-minus-new (J7/U2)") {
    val live = Seq((2L, 1L, 1), (3L, 1L, 1), (9L, 1L, 2)).toDF("child", "ancestor", "dist")
    val fresh = Seq((2L, 1L, 1), (3L, 1L, 1)).toDF("child", "ancestor", "dist")
    val prune = Closure.pruneSet(live, fresh).as[(Long, Long, Int)].collect().toSet
    assert(prune == Set((9L, 1L, 2)))
  }

  test("file-watch streaming merge appends only novel keys per batch") {
    val in = java.nio.file.Files.createTempDirectory("smerge-in").toString
    val store = java.nio.file.Files.createTempDirectory("smerge-store").toString + "/t"
    val schema = Seq((1L, "a")).toDF("id", "v").schema
    // batch 1
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(in)
    val q = StreamingMerge.fileWatchMerge(spark, in, schema, store, Seq("id"))
    q.processAllAvailable()
    assert(spark.read.parquet(store).count() == 2)
    // batch 2: one duplicate key, one new
    Seq((2L, "dup"), (3L, "c")).toDF("id", "v")
      .write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(store).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c")) // dup filtered
  }

  test("LSH bucket cap bounds a degenerate hot bucket, accounting reports it") {
    // 50 identical empty-ish docs share every band bucket (the classic
    // degenerate corpus); 2 genuinely-similar docs share theirs
    val docs = (Seq.tabulate(50)(i => (i.toLong, "x x x x")) ++
      Seq((100L, "real content here now"), (101L, "real content here now")))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatureDirect(docs, "doc_id", "text", 3, 8)
    // uncapped: the hot bucket alone is 50*49/2 = 1225 pairs
    val uncapped = Dedup.lshCandidates(sig, 8, 4, maxBucket = Long.MaxValue).count()
    assert(uncapped == 1225 + 1)
    // capped at 10: the degenerate bucket is skipped, the real pair stays
    val capped = Dedup.lshCandidates(sig, 8, 4, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)))
    // accounting: both bands report the size-50 bucket
    val dropped = Dedup.oversizedLshBuckets(sig, 8, 4, maxBucket = 10)
      .select($"df").as[Long].collect().toSeq.sorted
    assert(dropped == Seq(50L, 50L))
  }

  test("incremental dedup flags only incoming docs whose bands hit the store") {
    val store = Dedup.bandSignatures(Seq(
      (0L, "the exact same sentence appears here today"),
      (2L, "an unrelated historical document about trains"),
      (4L, "the exact same sentence appears here today")) // in-store dup
      .toDF("doc_id", "text"), "doc_id", "text", 3, 8, 4)
    val inc = Dedup.bandSignatures(Seq(
      (1L, "the exact same sentence appears here today"), // dup of 0 and 4
      (3L, "a genuinely novel incoming document about ships"))
      .toDF("doc_id", "text"), "doc_id", "text", 3, 8, 4)
    val got = Dedup.incrementalDuplicates(inc, store)
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 hits on both bands, canonical prior copy is min(0, 4) = 0;
    // doc 3 is novel -> absent
    assert(got == Seq((1L, 2L, 0L)))
  }

  test("embedding near-dup bucket cap bounds the all-zero-vector bucket") {
    val zeros = Seq.tabulate(30)(i => (i.toLong, Array(0f, 0f, 0f, 0f)))
    val real = Seq((100L, Array(1f, -1f, 0.5f, 0f)), (101L, Array(1f, -1f, 0.4f, 0f)))
    val emb = (zeros ++ real).toDF("vec_id", "embedding")
    val capped = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
        bits = 4, minSim = 0.9, maxBucket = 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)))
    // uncapped, the 30 zero vectors emit all 435 pairs AND each passes
    // the sim filter (0/0 = NaN, and Spark orders NaN above every
    // double) — the degenerate bucket poisons the result as well as the
    // shuffle, which is exactly why the cap is the default
    val uncapped = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      bits = 4, minSim = 0.9, maxBucket = Long.MaxValue).count()
    assert(uncapped == 435 + 1)
  }

  test("decontamination flags corpus docs overlapping the benchmark set") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"), // benchmark
      (100L, "a quick brown fox runs"), // shares "quick brown fox"
      (101L, "totally different words entirely here"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val hits = Curation.contaminated(
        sh.filter($"doc_id" >= 100), sh.filter($"doc_id" < 100))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(100L -> 1L)) // one shared 3-gram; 101 is clean
    // bloom prefilter prunes work, never changes the answer (false
    // positives die in the exact semi-join)
    val bloomHits = Curation.contaminatedBloom(
        sh.filter($"doc_id" >= 100), sh.filter($"doc_id" < 100),
        expectedItems = 100L)
      .as[(Long, Long)].collect().toMap
    assert(bloomHits == hits)
  }

  test("jaccardPairsFromDocs equals the generic shingle-frame entry point") {
    val rnd = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 12L).map(i =>
      (i, Seq.fill(6 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    for (maxDf <- Seq(Long.MaxValue, 4L)) {
      val generic = Dedup.jaccardPairs(
        Dedup.shingles(docs, "doc_id", "text", 2), 0.1, maxDf)
        .as[(Long, Long, Double)].collect().toSet
      val direct = Dedup.jaccardPairsFromDocs(docs, "doc_id", "text", 2, 0.1, maxDf)
        .as[(Long, Long, Double)].collect().toSet
      assert(direct == generic, s"maxDf=$maxDf")
      assert(maxDf == 4L || generic.nonEmpty) // uncapped run must find pairs
    }
  }

  test("containment finds the quoted-inside pair that Jaccard misses") {
    val quote = "the original passage reads verbatim like this exact text"
    val docs = Seq(
      (1L, quote), // the short original
      (2L, ("filler words around " * 10) + quote + (" and much more commentary" * 10)),
      (3L, "entirely unrelated content with different words throughout here now"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairsFromDocs(docs, "doc_id", "text", 3, 0.9)
      .as[(Long, Long, Double, Double)].collect()
    // doc 1's shingles all appear in doc 2: containment of A in B ≈ 1
    assert(cont.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(cont.head._3 == 1.0 && cont.head._4 < 0.5)
    // the same pair is invisible to Jaccard at any useful threshold
    val jac = Dedup.jaccardPairsFromDocs(docs, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(r => r._1 == 1L && r._2 == 2L))
  }

  test("stratified sample keeps n per stratum, deterministically") {
    val df = (1 to 20).map(i => (if (i % 2 == 0) "en" else "de", i.toLong))
      .toDF("lang", "doc_id")
    val s1 = Curation.stratifiedSample(df, "lang", "doc_id", 3)
      .as[(String, Long)].collect().toSet
    assert(s1.count(_._1 == "en") == 3 && s1.count(_._1 == "de") == 3)
    val s2 = Curation.stratifiedSample(df, "lang", "doc_id", 3)
      .as[(String, Long)].collect().toSet
    assert(s1 == s2) // reproducible pick
  }

  test("repetition ratio scores looping text high, varied text low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // one dominant 2-gram
      (2L, "every word here is completely different"))
      .toDF("doc_id", "text")
    val byId = Curation.repetitionRatio(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(byId(1L)._1 == 1.0 && byId(1L)._2) // "spam spam" x5 of 5
    assert(byId(2L)._1 < 0.2 + 1e-9 && !byId(2L)._2)
  }

  test("partitioned store layout prunes single-reference scans") {
    val dir = java.nio.file.Files.createTempDirectory("locstore").toString + "/featureloc"
    Seq(("f1", "chr1", 0, 10, 1, 0), ("f2", "chr1", 5, 20, 1, 0),
      ("f3", "chr2", 0, 30, -1, 0))
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand", "rank")
      .write.partitionBy("srcfeature").parquet(dir)
    val scan = spark.read.parquet(dir).filter($"srcfeature" === "chr1")
    assert(scan.count() == 2)
    // the filter lands in PartitionFilters (pruned scan), not a
    // post-scan Filter over the whole table
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("srcfeature"))
    val scanNode = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(scanNode.metadata("PartitionFilters").contains("srcfeature"))
    // only chr1's directory is actually selected
    val selected = scanNode.relation.location.listFiles(
      scanNode.partitionFilters, scanNode.dataFilters)
    assert(selected.flatMap(_.files).forall(_.getPath.toString.contains("srcfeature=chr1")))
  }

  test("distributed id allocation: dense, unique, deterministic, no global window") {
    val df = (1 to 500).map(i => s"key%04d".format(501 - i)).toDF("key")
      .repartition(8)
    val ids1 = IdAllocate.denseIds(df, "key", base = 1000L)
      .select($"key", $"id").as[(String, Long)].collect().sortBy(_._1)
    // dense range starting at base+1, ordered by key
    assert(ids1.map(_._2).toSeq == (1001L to 1500L))
    // deterministic across re-runs
    val ids2 = IdAllocate.denseIds(df, "key", base = 1000L)
      .select($"key", $"id").as[(String, Long)].collect().sortBy(_._1)
    assert(ids1.toSeq == ids2.toSeq)
    // the plan contains no single-partition window
    val plan = IdAllocate.denseIds(df, "key", 0L).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("bucketed tables join without a shuffle exchange (co-located join)") {
    import graft.sinks.BucketedStore
    val base = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = (1L to 100L).map(i => (i, s"o$i")).toDF("k", "o_payload")
    val items = (1L to 300L).map(i => (i % 100 + 1, s"i$i")).toDF("k", "i_payload")
    BucketedStore.writeBucketed(orders, "bk_orders", s"$base/o", "k", 4)
    BucketedStore.writeBucketed(items, "bk_items", s"$base/i", "k", 4)
    val joined = spark.table("bk_orders").hint("merge")
      .join(spark.table("bk_items"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides read bucketed: the sort-merge join has NO hash exchange
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free co-located join, got:\n$plan")
    assert(joined.count() == 300)
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_items")
  }

  test("zone-map store prunes files driver-side, results identical to full scan") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("zmap").toString + "/store"
    val df = Seq.tabulate(400)(i => (i, s"v$i")).toDF("k", "v")
    SkippingStore.write(df, "k", dir, nFiles = 8)
    // the zonemap is one row per data file, invisible to directory reads
    assert(SkippingStore.zoneMap(spark, dir).count() == 8)
    assert(spark.read.parquet(dir).count() == 400)
    val (kept, total, pruned) =
      SkippingStore.readPruned(spark, dir, "k", lit(100), lit(149))
    assert(total == 8 && kept < total, s"kept $kept of $total")
    val got = pruned.select($"k", $"v").as[(Int, String)].collect().toSet
    assert(got == (100 to 149).map(i => (i, s"v$i")).toSet)
    // an out-of-range probe keeps zero files and yields an empty, typed frame
    val (k0, _, empty) =
      SkippingStore.readPruned(spark, dir, "k", lit(1000), lit(2000))
    assert(k0 == 0 && empty.count() == 0 && empty.schema == pruned.schema)
  }

  test("zone-map append indexes only the new files, pruning stays exact") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("zmapapp").toString + "/store"
    SkippingStore.write(
      Seq.tabulate(200)(i => (i, s"v$i")).toDF("k", "v"), "k", dir, nFiles = 4)
    assert(SkippingStore.zoneMap(spark, dir).count() == 4)
    SkippingStore.append(
      Seq.tabulate(100)(i => (200 + i, s"v${200 + i}")).toDF("k", "v"),
      "k", dir, nFiles = 2)
    // 2 new zone rows, the 4 old ones untouched
    assert(SkippingStore.zoneMap(spark, dir).count() == 6)
    // a range spanning the append boundary reads from both generations
    val (kept, total, pruned) =
      SkippingStore.readPruned(spark, dir, "k", lit(180), lit(230))
    assert(total == 6 && kept < total)
    assert(pruned.select($"k", $"v").as[(Int, String)].collect().toSet ==
      (180 to 230).map(i => (i, s"v$i")).toSet)
  }

  test("zone-map store: fresh-dir append is write, foreign files fail loudly") {
    import graft.sinks.SkippingStore
    val base = java.nio.file.Files.createTempDirectory("zmapguard").toString
    // append on a directory with no _zonemap behaves as the initial write
    val fresh = s"$base/fresh"
    SkippingStore.append(
      Seq.tabulate(50)(i => (i, s"v$i")).toDF("k", "v"), "k", fresh, nFiles = 2)
    assert(SkippingStore.zoneMap(spark, fresh).count() == 2)
    val (_, _, all) = SkippingStore.readPruned(spark, fresh, "k", lit(0), lit(49))
    assert(all.count() == 50)
    // a data file written BEHIND the index (plain parquet append) must
    // make reads and further appends fail loudly, never lose rows
    Seq((999, "vx")).toDF("k", "v").write.mode("append").parquet(fresh)
    val e1 = intercept[IllegalArgumentException] {
      SkippingStore.readPruned(spark, fresh, "k", lit(0), lit(49))
    }
    assert(e1.getMessage.contains("out of sync"))
    val e2 = intercept[IllegalArgumentException] {
      SkippingStore.append(Seq((1, "v")).toDF("k", "v"), "k", fresh, 1)
    }
    assert(e2.getMessage.contains("out of sync"))
    // a data dir with files but NO map refuses blind appends
    val orphan = s"$base/orphan"
    Seq((1, "v")).toDF("k", "v").write.parquet(orphan)
    val e3 = intercept[IllegalArgumentException] {
      SkippingStore.append(Seq((2, "w")).toDF("k", "v"), "k", orphan, 1)
    }
    assert(e3.getMessage.contains("not a zone store"))
  }

  test("bloom skipping: no false negatives, prunes scattered-key lookups") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString + "/store"
    // keys are content hashes: uniform across every file's sort range,
    // so zones are useless and only the bloom can prune
    val df = Seq.tabulate(400) { i =>
      (i, java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }.toDF("k", "key")
    SkippingStore.write(df, "k", dir, nFiles = 8)
    SkippingStore.bloomIndex(spark, dir, "key", nbits = 1 << 12, k = 5)
    assert(SkippingStore.bloomMap(spark, dir).count() == 8)
    // EVERY present key must be found (no false negatives), each from
    // few files; spot-check a deterministic sample
    var keptSum = 0L
    for (i <- 0 until 400 by 23) {
      val want = df.filter($"k" === i).select($"key").as[String].head()
      val (kept, total, hit) = SkippingStore.readBloomEq(spark, dir, "key", want)
      assert(total == 8)
      keptSum += kept
      assert(hit.select($"k").as[Int].collect().toSeq == Seq(i))
    }
    // pruning actually happened on average (fp rate well under 1 file)
    assert(keptSum < 2L * (400 / 23 + 1), s"kept $keptSum files total")
    // an absent key yields an empty frame, usually zero files opened
    val (_, _, miss) = SkippingStore.readBloomEq(spark, dir, "key", "no-such-key")
    assert(miss.count() == 0)
  }

  test("multi-column zones prune on a correlated secondary column, stay correct on any") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("mzone").toString + "/store"
    // ts is the layout; size correlates with ts (bigger later), noise doesn't
    val df = Seq.tabulate(400)(i => (i, i * 10 + i % 3, (i * 37) % 101))
      .toDF("ts", "size", "noise")
    SkippingStore.writeMulti(df, "ts", Seq("size", "noise"), dir, nFiles = 8)
    // correlated column: a narrow size range lives in few files
    val (kept, total, hit) = SkippingStore.readPrunedOn(spark, dir, "size", 100.0, 300.0)
    assert(total == 8 && kept < total, s"kept $kept of $total")
    val want = df.filter($"size" >= 100 && $"size" <= 300)
      .select($"ts").as[Int].collect().toSet
    assert(hit.select($"ts").as[Int].collect().toSet == want && want.nonEmpty)
    // uncorrelated column: may keep everything, must still be exact
    val (_, _, hit2) = SkippingStore.readPrunedOn(spark, dir, "noise", 10.0, 20.0)
    val want2 = df.filter($"noise" >= 10 && $"noise" <= 20)
      .select($"ts").as[Int].collect().toSet
    assert(hit2.select($"ts").as[Int].collect().toSet == want2 && want2.nonEmpty)
    // un-indexed column refuses loudly
    val e = intercept[IllegalArgumentException] {
      SkippingStore.readPrunedOn(spark, dir, "ts", 0.0, 1.0)
    }
    assert(e.getMessage.contains("no stats"))
    // append extends the sidecar for new files only, same column set
    val delta = Seq.tabulate(100)(i => (1000 + i, 10000 + i * 10, i % 7))
      .toDF("ts", "size", "noise")
    SkippingStore.appendMulti(delta, "ts", dir, nFiles = 2)
    val (k3, t3, hit3) = SkippingStore.readPrunedOn(spark, dir, "size", 10000.0, 10500.0)
    assert(t3 == 10 && k3 < t3) // appended range lives in the new files
    assert(hit3.select($"ts").as[Int].collect().toSet ==
      delta.filter($"size" <= 10500).select($"ts").as[Int].collect().toSet)
  }

  test("Z-order layout prunes on BOTH columns; single-column sort only on its own") {
    import graft.sinks.SkippingStore
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // a full 32x32 grid: x and y are perfectly uncorrelated, the
    // worst case for a single-column sort's secondary-column zones
    val df = Seq.tabulate(1024)(i => (i, i / 32, i % 32)).toDF("id", "x", "y")
    SkippingStore.writeMulti(df, "x", Seq("x", "y"), s"$base/sorted", nFiles = 16)
    SkippingStore.writeZOrder(df, "x", "y", s"$base/zorder", nFiles = 16)
    val want = df.filter($"y" >= 0 && $"y" <= 7).select($"id").as[Int].collect().toSet
    // sorted-by-x: every file spans all of y — nothing skips
    val (keptS, totalS, hitS) =
      SkippingStore.readPrunedOn(spark, s"$base/sorted", "y", 0.0, 7.0)
    assert(totalS == 16 && keptS == totalS)
    assert(hitS.select($"id").as[Int].collect().toSet == want)
    // z-order: the same y range lives in a quarter of the curve
    val (keptZ, totalZ, hitZ) =
      SkippingStore.readPrunedOn(spark, s"$base/zorder", "y", 0.0, 7.0)
    assert(totalZ == 16 && keptZ < totalS / 2, s"kept $keptZ of $totalZ")
    assert(hitZ.select($"id").as[Int].collect().toSet == want)
    // and x still prunes too — both dimensions carry real zones
    val (keptX, _, hitX) =
      SkippingStore.readPrunedOn(spark, s"$base/zorder", "x", 0.0, 7.0)
    assert(keptX < totalZ, s"kept $keptX of $totalZ on x")
    assert(hitX.select($"id").as[Int].collect().toSet ==
      df.filter($"x" <= 7).select($"id").as[Int].collect().toSet)
    // incremental append: original curve geometry reused, sidecar
    // extended for the new files only, pruning stays exact on both cols
    val delta = Seq.tabulate(128)(i => (2000 + i, i / 16, 16 + i % 16))
      .toDF("id", "x", "y")
    SkippingStore.appendZOrder(delta, s"$base/zorder", nFiles = 2)
    val (keptA, totalA, hitA) =
      SkippingStore.readPrunedOn(spark, s"$base/zorder", "y", 0.0, 7.0)
    assert(totalA == 18 && keptA < totalA, s"kept $keptA of $totalA")
    // delta rows all have y >= 16: the y<=7 result is unchanged
    assert(hitA.select($"id").as[Int].collect().toSet == want)
    val (_, _, hitB) =
      SkippingStore.readPrunedOn(spark, s"$base/zorder", "y", 16.0, 20.0)
    assert(hitB.select($"id").as[Int].collect().toSet ==
      (df.filter($"y" >= 16 && $"y" <= 20).select($"id").as[Int].collect().toSet ++
        delta.filter($"y" <= 20).select($"id").as[Int].collect().toSet))
    // appending to a non-z-order store refuses loudly
    val e2 = intercept[IllegalArgumentException] {
      SkippingStore.appendZOrder(delta, s"$base/sorted", nFiles = 2)
    }
    assert(e2.getMessage.contains("_zorder_meta"))
  }

  test("string and datetime zone stats: lexicographic prune, ANSI-safe epoch widening") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("szone").toString + "/store"
    // layout sorted BY THE STRING: url prefixes cluster per file, so a
    // host-range prune actually skips; day is a datetime stats column
    val df = Seq.tabulate(400) { i =>
      (i, f"https://host-${i / 50}%02d.example/p$i",
        java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"))
    }.toDF("id", "url", "day")
    SkippingStore.writeMulti(df, "url", Seq("url", "day"), dir, nFiles = 8)
    val (kept, total, hit) = SkippingStore.readPrunedOnString(
      spark, dir, "url", "https://host-02", "https://host-03.zzz")
    assert(total == 8 && kept < total, s"kept $kept of $total")
    val want = df.filter($"url" >= "https://host-02" && $"url" <= "https://host-03.zzz")
      .select($"id").as[Int].collect().toSet
    assert(hit.select($"id").as[Int].collect().toSet == want && want.nonEmpty)
    // datetime stats column: the zone intersection and residual both
    // run on epoch micros (a raw double cast would be an ANSI error)
    val lo = java.sql.Timestamp.valueOf("2024-01-05 00:00:00").getTime * 1000.0
    val hi = java.sql.Timestamp.valueOf("2024-01-07 00:00:00").getTime * 1000.0
    val (_, _, hit2) = SkippingStore.readPrunedOn(spark, dir, "day", lo, hi)
    val want2 = df.filter($"day" >= "2024-01-05" && $"day" <= "2024-01-07")
      .select($"id").as[Int].collect().toSet
    assert(hit2.select($"id").as[Int].collect().toSet == want2 && want2.nonEmpty)
    // wrong-kind entry points refuse loudly in both directions
    assert(intercept[IllegalArgumentException] {
      SkippingStore.readPrunedOn(spark, dir, "url", 0.0, 1.0)
    }.getMessage.contains("readPrunedOnString"))
    assert(intercept[IllegalArgumentException] {
      SkippingStore.readPrunedOnString(spark, dir, "day", "a", "z")
    }.getMessage.contains("readPrunedOn"))
    // appendMulti carries the string/datetime stat kinds forward
    val delta = Seq.tabulate(60) { i =>
      (1000 + i, s"https://zzz-late.example/p$i",
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    }.toDF("id", "url", "day")
    SkippingStore.appendMulti(delta, "url", dir, nFiles = 2)
    val (k3, t3, hit3) = SkippingStore.readPrunedOnString(
      spark, dir, "url", "https://zzz", "https://zzz~")
    assert(t3 == 10 && k3 < t3, s"kept $k3 of $t3")
    assert(hit3.select($"id").as[Int].collect().toSet ==
      delta.select($"id").as[Int].collect().toSet)
  }

  test("bloomAppend covers appended files: old and new keys found, geometry reused") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("bloomapp").toString + "/store"
    def hashed(r: Range) = r.map { i =>
      (i, java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }.toDF("k", "key")
    SkippingStore.write(hashed(0 until 200), "k", dir, nFiles = 4)
    SkippingStore.bloomIndex(spark, dir, "key", nbits = 1 << 12, k = 5)
    // plain data append, then index only the new files
    hashed(200 until 300).repartition(2).write.mode("append").parquet(dir)
    SkippingStore.bloomAppend(spark, dir, "key")
    assert(SkippingStore.bloomMap(spark, dir).count() == 6)
    assert(SkippingStore.bloomMap(spark, dir)
      .select($"nbits", $"k").distinct().count() == 1) // geometry reused
    for (i <- Seq(3, 150, 200, 299)) { // spans old and appended files
      val want = hashed(i to i).select($"key").as[String].head()
      val (_, total, hit) = SkippingStore.readBloomEq(spark, dir, "key", want)
      assert(total == 6)
      assert(hit.select($"k").as[Int].collect().toSeq == Seq(i))
    }
    // appending with no sidecar refuses loudly
    val bare = java.nio.file.Files.createTempDirectory("bloomapp2").toString + "/s"
    hashed(0 until 10).write.parquet(bare)
    val e = intercept[IllegalArgumentException] {
      SkippingStore.bloomAppend(spark, bare, "key")
    }
    assert(e.getMessage.contains("no _bloommap"))
  }

  test("bloom skipping fails loudly on store drift") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("bloomdrift").toString + "/store"
    Seq((1, "a"), (2, "b")).toDF("k", "key").write.parquet(dir)
    SkippingStore.bloomIndex(spark, dir, "key")
    // foreign data file appears after indexing -> must refuse, not miss rows
    Seq((3, "c")).toDF("k", "key").write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      SkippingStore.readBloomEq(spark, dir, "key", "c")
    }
    assert(e.getMessage.contains("out of sync"))
  }

  test("readBloomIn refuses a bloom built on a different key column") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("bloomwrongcol").toString + "/s"
    Seq((1, "a", "x1"), (2, "b", "x2")).toDF("k", "key", "other")
      .write.parquet(dir)
    SkippingStore.bloomIndex(spark, dir, "other")
    // probing 'key' against a filter that indexed 'other' would prune
    // wrong files and silently drop join rows — must refuse loudly
    val e = intercept[IllegalArgumentException] {
      SkippingStore.readBloomIn(spark, dir, "key", Seq("a"))
    }
    assert(e.getMessage.contains("indexes"))
    // probing the indexed column works
    val (_, _, got) = SkippingStore.readBloomIn(spark, dir, "other", Seq("x2"))
    assert(got.select($"k").as[Int].collect().toSeq == Seq(2))
  }

  test("compactIndexed refuses a legacy (pre-keycol) bloom instead of de-indexing") {
    import graft.sinks.SkippingStore
    val dir = java.nio.file.Files.createTempDirectory("legacycompact").toString + "/s"
    val df = Seq.tabulate(40)(i => (i, s"h$i")).toDF("k", "key")
    SkippingStore.writeMulti(df, "k", Seq("k"), dir, 4)
    SkippingStore.bloomIndex(spark, dir, "key")
    // simulate a legacy sidecar: strip the keycol marker in place
    val legacy = spark.read.parquet(s"$dir/_bloommap").drop("keycol")
      .localCheckpoint()
    legacy.write.mode("overwrite").parquet(s"$dir/_bloommap")
    val e = intercept[IllegalArgumentException] {
      SkippingStore.compactIndexed(spark, dir, "k")
    }
    assert(e.getMessage.contains("keycol"))
    // the store is untouched: still readable, bloom sidecar still there
    assert(spark.read.parquet(dir).count() == 40)
  }

  test("gzip FASTA write produces compressed part files (K8)") {
    val out = java.nio.file.Files.createTempDirectory("fagz").toString + "/fa"
    graft.sources.Fasta.write(Seq(("s1", "ACGT")).toDF("id", "seq"), "id", "seq",
      out, gzip = true)
    val parts = new java.io.File(out).listFiles().filter(_.getName.endsWith(".gz"))
    assert(parts.nonEmpty)
    val content = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(new java.io.FileInputStream(parts.head))
    ).mkString
    assert(content == ">s1\nACGT\n")
  }
}
