package graft.plans

import graft.SparkSpec
import graft.sinks.SkippingStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The transparent zone-prune rule: plain `spark.read.parquet(store)
  * .filter(...)` must open only surviving files, return exactly the
  * full-scan rows, fire on either indexed column, stay idempotent, and
  * leave non-stores and non-range filters untouched. */
class ZonePruneSpec extends SparkSpec {
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.inputRDDs() // force lazy init
        s.relation.location.inputFiles.map(p =>
          new org.apache.hadoop.fs.Path(p).getName).toSet
    }.reduce(_ ++ _)

  private lazy val store: (String, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("zprule").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, i * 10, s"u${i / 50}")).toDF("k", "v", "u")
    SkippingStore.writeMulti(df, "k", Seq("k", "v", "u"), dir, nFiles = 8)
    (dir, df)
  }

  test("a filtered plain read opens only surviving files, rows exact") {
    val (dir, df) = store
    val got = spark.read.parquet(dir).filter($"v" >= 1000.0 && $"v" <= 1500.0)
    val files = scannedFiles(got)
    assert(files.size < 8, s"expected pruning, scanned ${files.size} of 8")
    assert(got.select($"k").as[Int].collect().toSet ==
      df.filter($"v" >= 1000 && $"v" <= 1500).select($"k").as[Int].collect().toSet)
    // string column prunes too (the layout is k-sorted; u correlates)
    val gs = spark.read.parquet(dir).filter($"u" === "u0")
    assert(scannedFiles(gs).size < 8)
    assert(gs.count() == 50)
  }

  test("idempotent at the fixed point; equality predicates prune") {
    val (dir, df) = store
    val got = spark.read.parquet(dir).filter($"k" === 42)
    assert(scannedFiles(got).size == 1)
    assert(got.select($"v").as[Int].collect().toSeq == Seq(420))
    // run the optimizer twice over the same plan — no further rewrite
    val once = got.queryExecution.optimizedPlan
    val twice = spark.sessionState.optimizer.execute(once)
    assert(once == twice, "rule must reach a fixed point")
  }

  test("non-range predicates and plain parquet dirs are untouched") {
    val (dir, df) = store
    // no sidecar: ordinary parquet dir
    val plainDir = java.nio.file.Files.createTempDirectory("zpplain").toString + "/p"
    df.write.parquet(plainDir)
    val plain = spark.read.parquet(plainDir).filter($"v" >= 1000)
    assert(scannedFiles(plain).nonEmpty) // just runs, unpruned
    assert(plain.count() == df.filter($"v" >= 1000).count())
    // unindexable predicate shape on the store: correct, simply unpruned
    val mod = spark.read.parquet(dir).filter($"v" % 2 === 0)
    assert(mod.count() == df.filter($"v" % 2 === 0).count())
    assert(scannedFiles(mod).size == 8)
  }

  test("a filter on an unindexed column keeps correctness (no prune)") {
    val dir = java.nio.file.Files.createTempDirectory("zpuncol").toString + "/s"
    val df = Seq.tabulate(100)(i => (i, i % 7)).toDF("k", "w")
    SkippingStore.writeMulti(df, "k", Seq("k"), dir, nFiles = 4)
    val got = spark.read.parquet(dir).filter($"w" === 3)
    assert(scannedFiles(got).size == 4) // w carries no zones
    assert(got.count() == df.filter($"w" === 3).count())
  }

  // a key that scatters uniformly across every file's range: zones are
  // useless, only the Bloom sidecar can prune the point lookup
  private lazy val bloomStore: (String, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("zpbloom").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, s"h${i % 97}x${i}"))
      .toDF("k", "key")
    SkippingStore.write(df, "k", dir, nFiles = 8)
    SkippingStore.bloomIndex(spark, dir, "key", nbits = 1 << 14, k = 5)
    (dir, df)
  }

  test("equality on a bloom-indexed hash column prunes a plain read") {
    val (dir, df) = bloomStore
    val got = spark.read.parquet(dir).filter($"key" === "h5x102")
    assert(scannedFiles(got).size < 8,
      s"bloom must prune a point lookup, scanned ${scannedFiles(got).size} of 8")
    assert(got.select($"k").as[Int].collect().toSeq == Seq(102))
    // absent value: provably-empty everywhere is allowed to scan nothing
    val miss = spark.read.parquet(dir).filter($"key" === "nope")
    assert(miss.count() == 0)
  }

  test("IN-lists prune to the union of per-value survivor sets") {
    val (dir, _) = bloomStore
    val got = spark.read.parquet(dir).filter($"key".isin("h5x102", "h12x206"))
    assert(scannedFiles(got).size < 8)
    assert(got.select($"k").as[Int].collect().toSet == Set(102, 206))
    // zone-side IN on the sorted store column
    val (zdir, zdf) = store
    val zi = spark.read.parquet(zdir).filter($"k".isin(3, 397))
    assert(scannedFiles(zi).size == 2) // first and last file only
    assert(zi.select($"v").as[Int].collect().toSet ==
      zdf.filter($"k".isin(3, 397)).select($"v").as[Int].collect().toSet)
  }

  test("the SQL surface prunes too: spark.sql over a view of the store") {
    val (dir, df) = store
    spark.read.parquet(dir).createOrReplaceTempView("zp_store")
    val got = spark.sql(
      "SELECT k, v FROM zp_store WHERE v >= 1000 AND v <= 1500")
    assert(scannedFiles(got).size < 8, "SQL filter must prune like the API")
    assert(got.count() == df.filter($"v" >= 1000 && $"v" <= 1500).count())
    val in = spark.sql("SELECT v FROM zp_store WHERE k IN (3, 397)")
    assert(scannedFiles(in).size == 2)
    assert(in.as[Int].collect().toSet == Set(30, 3970))
  }

  test("IS NULL / IS NOT NULL prune on the sidecar's null counts") {
    val dir = java.nio.file.Files.createTempDirectory("zpnull").toString + "/s"
    // nulls live only in the low-k half of the sorted layout
    val df = Seq.tabulate(200)(i =>
      (i, if (i < 100) None else Some(i * 10))).toDF("k", "v")
    graft.sinks.SkippingStore.writeMulti(df, "k", Seq("k", "v"), dir, 4)
    val nulls = spark.read.parquet(dir).filter($"v".isNull)
    assert(scannedFiles(nulls).size == 2, "IS NULL opens only null-bearing files")
    assert(nulls.count() == 100)
    val notNulls = spark.read.parquet(dir).filter($"v".isNotNull)
    assert(scannedFiles(notNulls).size == 2, "IS NOT NULL skips all-null files")
    assert(notNulls.count() == 100)
    // the implicit isnotnull beside a comparison composes with the range
    val range = spark.read.parquet(dir).filter($"v" >= 1500 && $"v" <= 1700)
    assert(scannedFiles(range).size == 1)
    assert(range.count() == 21)
  }

  test("OR trees prune to the union; an opaque disjunct disables pruning") {
    val (dir, df) = store
    val ends = spark.read.parquet(dir)
      .filter($"v" <= 400 || $"v" >= 3500)
    assert(scannedFiles(ends).size == 2, "first and last file only")
    assert(ends.count() ==
      df.filter($"v" <= 400 || $"v" >= 3500).count())
    // one disjunct the sidecars can't judge: the whole OR must scan
    val opaque = spark.read.parquet(dir)
      .filter($"v" <= 400 || $"v" % 7 === 0)
    assert(scannedFiles(opaque).size == 8)
    assert(opaque.count() ==
      df.filter($"v" <= 400 || $"v" % 7 === 0).count())
  }

  test("startsWith prunes string zones as a prefix range") {
    val dir = java.nio.file.Files.createTempDirectory("zppfx").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, f"https://h${i / 50}%d.example/p$i%03d"))
      .toDF("k", "url")
    SkippingStore.writeMulti(df, "url", Seq("url"), dir, nFiles = 8)
    val got = spark.read.parquet(dir).filter($"url".startsWith("https://h3."))
    assert(scannedFiles(got).size < 8,
      s"prefix must prune, scanned ${scannedFiles(got).size} of 8")
    assert(got.count() == 50)
    // boundary correctness: a prefix equal to a whole value still finds it
    val one = spark.read.parquet(dir)
      .filter($"url".startsWith("https://h0.example/p000"))
    assert(one.select($"k").as[Int].collect().toSeq == Seq(0))
    // non-ASCII prefix: unpruned but correct
    assert(spark.read.parquet(dir).filter($"url".startsWith("https://ü")).count() == 0)
  }

  test("a stale sidecar (foreign data file) falls back to the full scan") {
    val dir = java.nio.file.Files.createTempDirectory("zpstale").toString + "/s"
    val df = Seq.tabulate(100)(i => (i, i * 10)).toDF("k", "v")
    SkippingStore.writeMulti(df, "k", Seq("k", "v"), dir, nFiles = 4)
    // a foreign writer drops a file the sidecar doesn't map: the
    // coverage check throws inside the rule, which must swallow it and
    // leave the plan unpruned — rows exact, nothing silently dropped
    Seq((500, 5000)).toDF("k", "v").write.mode("append").parquet(dir)
    val got = spark.read.parquet(dir).filter($"v" >= 4000)
    assert(scannedFiles(got).size == 5, "stale sidecar must not prune")
    // only the foreign row matches — pruning on the stale map would
    // have dropped exactly this row
    assert(got.select($"k").as[Int].collect().toSeq == Seq(500))
  }

  test("DATE literals prune a date-sorted store, both polarities + boundary") {
    val dir = java.nio.file.Files.createTempDirectory("zpdate").toString + "/s"
    // 200 days from 2024-01-01, date-sorted: the crawl-store shape
    val df = Seq.tabulate(200)(i =>
      (i, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))))
      .toDF("k", "dt")
    SkippingStore.writeMulti(df, "dt", Seq("dt"), dir, nFiles = 8)
    def d(s: String) = lit(java.sql.Date.valueOf(s))
    // lower-bound polarity: late dates live in the last files only
    val late = spark.read.parquet(dir).filter($"dt" >= d("2024-06-19"))
    assert(scannedFiles(late).size < 8,
      s"dt >= DATE must prune, scanned ${scannedFiles(late).size} of 8")
    assert(late.count() == df.filter($"dt" >= d("2024-06-19")).count())
    // upper-bound polarity (strict < keeps at most one marginal
    // boundary file: the zone test is inclusive by design)
    val early = spark.read.parquet(dir).filter($"dt" < d("2024-01-26"))
    assert(scannedFiles(early).size <= 2)
    assert(early.select($"k").as[Int].collect().toSet == (0 until 25).toSet)
    // boundary: equality on a file-edge date keeps exactly its row
    val edge = spark.read.parquet(dir).filter($"dt" === d("2024-01-26"))
    assert(scannedFiles(edge).size <= 2)
    assert(edge.select($"k").as[Int].collect().toSeq == Seq(25))
    // IN-list of dates prunes to the union of survivor sets
    val in = spark.read.parquet(dir)
      .filter($"dt".isin(java.sql.Date.valueOf("2024-01-02"),
        java.sql.Date.valueOf("2024-07-15")))
    assert(scannedFiles(in).size <= 2)
    assert(in.select($"k").as[Int].collect().toSet == Set(1, 196))
    // a range with no matching zone scans nothing yet returns 0 rows
    assert(spark.read.parquet(dir).filter($"dt" > d("2025-01-01")).count() == 0)
  }

  test("CAST(ts AS DATE) predicates widen to day intervals — no in-day false prune") {
    // ADVICE r8 (high): a point translation of the DATE literal prunes
    // files whose timestamps sit strictly INSIDE the literal's day
    // (zmin > midnight). Every row here lives inside 2024-03-07 but
    // none at midnight, so the old point-equality zone test killed
    // every file and returned zero rows.
    val dir = java.nio.file.Files.createTempDirectory("zpcastdate").toString + "/s"
    val df = Seq.tabulate(50)(i =>
      (i, java.sql.Timestamp.valueOf(f"2024-03-07 ${1 + i % 20}%02d:15:00")))
      .toDF("k", "ts")
    SkippingStore.writeMulti(df, "ts", Seq("ts"), dir, nFiles = 4)
    def d(s: String) = lit(java.sql.Date.valueOf(s))
    val eq = spark.read.parquet(dir).filter($"ts".cast("date") === d("2024-03-07"))
    assert(eq.count() == 50, "every in-day row satisfies the cast-equality")
    val le = spark.read.parquet(dir).filter($"ts".cast("date") <= d("2024-03-07"))
    assert(le.count() == 50, "upper day bound must widen to end-of-day")
    val in = spark.read.parquet(dir)
      .filter($"ts".cast("date").isin(java.sql.Date.valueOf("2024-03-07"),
        java.sql.Date.valueOf("2024-03-09")))
    assert(in.count() == 50, "IN over cast-dates must widen to the day hull")
    // and the widened form still PRUNES a multi-day store: days 1..100
    // at noon, ts-sorted — one day's files are a strict subset
    val dir2 = java.nio.file.Files.createTempDirectory("zpcastdate2").toString + "/s"
    val many = Seq.tabulate(100)(i =>
      (i, java.sql.Timestamp.from(java.time.LocalDate.of(2024, 1, 1).plusDays(i)
        .atTime(12, 0).toInstant(java.time.ZoneOffset.UTC))))
      .toDF("k", "ts")
    SkippingStore.writeMulti(many, "ts", Seq("ts"), dir2, nFiles = 8)
    val one = spark.read.parquet(dir2).filter($"ts".cast("date") === d("2024-02-14"))
    assert(scannedFiles(one).size < 8,
      s"day equality must prune the multi-day store, scanned ${scannedFiles(one).size}")
    assert(one.select($"k").as[Int].collect().toSeq == Seq(44))
    val range = spark.read.parquet(dir2).filter($"ts".cast("date") < d("2024-01-14"))
    assert(scannedFiles(range).size <= 2)
    assert(range.count() == 13)
  }

  test("a writer-zone mismatch disables date pruning instead of shifting it") {
    // ADVICE r8 (medium): the sidecar's midnight-micros widening is
    // session-zone-dependent; the writer stamps its zone and a reader
    // in any other zone must fall back to the full scan — never
    // compare its own midnights against shifted stats.
    val dir = java.nio.file.Files.createTempDirectory("zptz").toString + "/s"
    val df = Seq.tabulate(120)(i =>
      (i, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))))
      .toDF("k", "dt")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try SkippingStore.writeMulti(df, "dt", Seq("k", "dt"), dir, nFiles = 4)
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    val got = spark.read.parquet(dir)
      .filter($"dt" >= lit(java.sql.Date.valueOf("2024-04-01")))
    assert(scannedFiles(got).size == 4,
      "a zone-mismatched stamp must not prune date predicates")
    assert(got.count() == 29) // 2024-04-01 .. 2024-04-29
    // non-datetime predicates on the same store still prune (the gate
    // is per-shape, not per-store)
    val num = spark.read.parquet(dir).filter($"k" < 30)
    assert(scannedFiles(num).size <= 2) // strict bound keeps <= 1 marginal file
    assert(num.count() == 30)
    // and a matching-zone store (written in this session's UTC) prunes
    val dir2 = java.nio.file.Files.createTempDirectory("zptz2").toString + "/s"
    SkippingStore.writeMulti(df, "dt", Seq("dt"), dir2, nFiles = 4)
    val ok = spark.read.parquet(dir2)
      .filter($"dt" >= lit(java.sql.Date.valueOf("2024-04-01")))
    assert(scannedFiles(ok).size == 1)
    assert(ok.count() == 29)
  }

  test("partitioned stores: bloom point lookups skip files inside partitions") {
    // a hash-scattered key no zone can prune: only the relative-path
    // bloom sidecar can narrow a point lookup inside the partitions
    val dir = java.nio.file.Files.createTempDirectory("zppbloom").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, i % 4, s"h${i % 97}x$i")).toDF("k", "p", "key")
    df.repartition(16).write.partitionBy("p").parquet(dir)
    SkippingStore.bloomIndexPartitioned(spark, dir, "key", nbits = 1 << 14, k = 5)
    val total = SkippingStore.listDataFileRelPaths(spark, dir).size
    assert(total > 4, s"fixture needs several files ($total)")
    val got = spark.read.parquet(dir).filter($"key" === "h5x102")
    assert(got.select($"k").as[Int].collect().toSeq == Seq(102))
    assert(graft.plans.PlanProbe.scannedFileCount(got) < total,
      "the partitioned bloom must prune the point lookup")
    // composed with a partition filter: both prunes in one scan
    val comp = spark.read.parquet(dir).filter($"p" === 2 && $"key" === "h5x102")
    assert(comp.select($"k").as[Int].collect().toSeq == Seq(102))
    // a stale bloom (unmapped append) must not drop rows — and must
    // not disable correctness anywhere
    Seq((9999, 1, "zzz")).toDF("k", "p", "key")
      .write.partitionBy("p").mode("append").parquet(dir)
    val stale = spark.read.parquet(dir).filter($"key" === "zzz")
    assert(stale.select($"k").as[Int].collect().toSeq == Seq(9999))
    SkippingStore.bloomIndexPartitioned(spark, dir, "key")
    val fresh = spark.read.parquet(dir).filter($"key" === "zzz")
    assert(fresh.select($"k").as[Int].collect().toSeq == Seq(9999))
  }

  test("partitioned stores: rider zones skip files INSIDE surviving partitions") {
    // the postings-store shape: directory partitioning on p, files
    // within each partition clustered by the rider column r — both
    // prunes must compose (partition pruning from the layout, file
    // skipping from the relative-path sidecar)
    val dir = java.nio.file.Files.createTempDirectory("zppart").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, i % 4, i)).toDF("k", "p", "r")
    df.repartitionByRange(16, $"p", $"r").sortWithinPartitions("p", "r")
      .write.partitionBy("p").parquet(dir)
    SkippingStore.indexPartitioned(spark, dir, Seq("r"))
    val fs = graft.sinks.HadoopSwap.fs(spark, dir)
    val filesInP1 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/p=1"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(filesInP1 > 1, s"fixture needs several files per partition, got $filesInP1")
    val got = spark.read.parquet(dir)
      .filter($"p" === 1 && $"r" >= 100 && $"r" <= 140)
    assert(got.select($"k").as[Int].collect().toSet ==
      (100 to 140).filter(_ % 4 == 1).toSet, "pruned rows must be exact")
    // the composed effect needs the real scan metric: partition
    // pruning (p=1) AND the sidecar survivor intersection land in the
    // executed scan's numFiles, not in the index's static listing
    val scanned = graft.plans.PlanProbe.scannedFileCount(got)
    assert(scanned < filesInP1,
      s"rider zones must skip files inside p=1: scanned $scanned of $filesInP1")
    // rows survive with their partition-column values intact
    assert(got.select($"p").distinct().as[Int].collect().toSeq == Seq(1))
    // fixed point: the rule recognizes its own PrunedFileIndex output
    val once = got.queryExecution.optimizedPlan
    val twice = spark.sessionState.optimizer.execute(once)
    assert(once == twice, "partitioned prune must reach a fixed point")
    // incremental index extension: append files, re-index, still exact
    Seq((1000, 1, 1000), (1001, 2, 1001)).toDF("k", "p", "r")
      .write.partitionBy("p").mode("append").parquet(dir)
    // stale sidecar (unmapped appended files): full scan, rows exact
    val stale = spark.read.parquet(dir).filter($"r" >= 1000)
    assert(stale.select($"k").as[Int].collect().toSet == Set(1000, 1001),
      "a stale partitioned sidecar must not drop appended rows")
    SkippingStore.indexPartitioned(spark, dir, Seq("r"))
    val fresh = spark.read.parquet(dir).filter($"r" >= 1000)
    assert(fresh.select($"k").as[Int].collect().toSet == Set(1000, 1001))
    assert(scannedFiles(fresh).size == 2, "re-indexed append prunes to the 2 new files")
  }

  test("a coercion-cast equality never probes the bloom index") {
    // string-typed keys that LOOK numeric: `key = 123` coerces to
    // CAST(key AS DOUBLE) = 123.0, so a bloom probe would hash "123.0"
    // while the index hashed the raw strings ("123", "05", ...) and
    // prune the very files that match — the silent-wrong-results shape
    val dir = java.nio.file.Files.createTempDirectory("zpcast").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, f"$i%03d")).toDF("k", "key")
    SkippingStore.write(df, "k", dir, nFiles = 8)
    SkippingStore.bloomIndex(spark, dir, "key", nbits = 1 << 14, k = 5)
    val got = spark.read.parquet(dir).filter($"key" === 123)
    // the cast-equality matches "123" (CAST("123" AS DOUBLE) = 123.0)
    assert(got.select($"k").as[Int].collect().toSeq == Seq(123),
      "cast-coerced equality must keep its matching rows")
    // and the guard itself: a cross-family probe refuses at the source
    assert(SkippingStore.bloomFileNames(spark, dir, "key",
      java.lang.Double.valueOf(123.0)).isEmpty,
      "bloomFileNames must refuse a numeric probe of a string index")
    // bare string equality still prunes through the bloom
    val bare = spark.read.parquet(dir).filter($"key" === "123")
    assert(scannedFiles(bare).size < 8)
    assert(bare.select($"k").as[Int].collect().toSeq == Seq(123))
  }

  test("a pre-keycol bloom sidecar is not rule-prunable but stays correct") {
    val (dir, df) = bloomStore
    val legacy = java.nio.file.Files.createTempDirectory("zplegacy").toString + "/s"
    df.write.parquet(legacy)
    // simulate a legacy sidecar: today's map minus the keycol marker
    spark.read.parquet(s"$dir/_bloommap").drop("keycol")
      .write.parquet(s"$legacy/_bloommap")
    val got = spark.read.parquet(legacy).filter($"key" === "h5x102")
    assert(got.select($"k").as[Int].collect().toSeq == Seq(102))
    assert(SkippingStore.bloomFileNames(spark, legacy, "key", "h5x102").isEmpty)
  }
}
