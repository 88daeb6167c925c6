package graft.etl

import graft.SparkSpec
import graft.export.Gff3Export
import graft.multimodal.{EbmlCodec, Mp4Codec, Multimodal}
import graft.sources.{Fasta, Gaf}
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

class ExportStreamSpec extends SparkSpec {
  import spark.implicits._

  test("GFF3 export emits parent-before-child, 1-based, escaped") {
    val feats = Seq(
      ("gene1", "g;1", "gene", "chr1", 99, 900, Option.empty[Double], Option(1),
        Option.empty[Int], Option("src"), Option.empty[String]),
      ("rna1", "r1", "mRNA", "chr1", 99, 900, Option.empty[Double], Option(1),
        Option.empty[Int], Option("src"), Option("gene1")),
      ("hit1", "h1", "match", "chr1", 999, 1500, Option(95.5), Option(-1),
        Option.empty[Int], Option.empty[String], Option.empty[String]))
      .toDF("uniquename", "name", "ftype", "srcfeature", "fmin", "fmax",
        "score", "strand", "phase", "source", "parent")
    val lines = Gff3Export.toGff3Lines(feats).as[String].collect()
    assert(lines.length == 3)
    val gene = lines.find(_.contains("ID=gene1")).get
    assert(gene.startsWith("chr1\tsrc\tgene\t100\t900\t.\t+\t.\t")) // 1-based, strand decoded
    assert(gene.contains("Name=g%3B1")) // reserved char escaped
    assert(lines.indexWhere(_.contains("ID=gene1")) <
      lines.indexWhere(_.contains("ID=rna1"))) // hierarchy order
    val hit = lines.find(_.contains("ID=hit1")).get
    assert(hit.contains("\t95.5\t-\t")) // %.3g score + strand
  }

  test("GFF3 pragmas lead with gff-version then sequence-regions") {
    val refs = Seq(("chr1", 2000), ("chr2", 500)).toDF("uniquename", "seqlen")
    val got = Gff3Export.pragmas(refs).as[String].collect().toSeq
    assert(got == Seq("##gff-version 3",
      "##sequence-region chr1 1 2000", "##sequence-region chr2 1 500"))
  }

  test("partitioned GFF3 write: one self-contained ordered doc per reference") {
    val refs = Seq(("chr1", 2000), ("chr2", 500)).toDF("uniquename", "seqlen")
    val feats = Seq(
      ("gene1", "g1", "gene", "chr1", 99, 900, Option.empty[Double], Option(1),
        Option.empty[Int], Option("src"), Option.empty[String]),
      ("rna1", "r1", "mRNA", "chr1", 99, 900, Option.empty[Double], Option(1),
        Option.empty[Int], Option("src"), Option("gene1")),
      ("gene2", "g2", "gene", "chr2", 10, 50, Option.empty[Double], Option(-1),
        Option.empty[Int], Option("src"), Option.empty[String]))
      .toDF("uniquename", "name", "ftype", "srcfeature", "fmin", "fmax",
        "score", "strand", "phase", "source", "parent")
    val out = java.nio.file.Files.createTempDirectory("gff3part").toString
    Gff3Export.writeDocument(refs, feats, out)
    // one directory per reference — the parallel per-chromosome shape
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("srcfeature=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("srcfeature=chr1", "srcfeature=chr2"))
    def readRef(r: String) =
      spark.read.textFile(s"$out/srcfeature=$r").collect().toSeq
    val chr1 = readRef("chr1")
    // each file is a self-contained GFF3: version, its region, ordered body
    assert(chr1.take(2) == Seq("##gff-version 3", "##sequence-region chr1 1 2000"))
    assert(chr1.indexWhere(_.contains("ID=gene1")) <
      chr1.indexWhere(_.contains("ID=rna1")))
    assert(readRef("chr2").take(2) ==
      Seq("##gff-version 3", "##sequence-region chr2 1 500"))
    // concatenated in srcfeature order the bodies match the single-file
    // canonical export's body line set and order
    val concatBody = (chr1 ++ readRef("chr2")).filterNot(_.startsWith("##"))
    val single = Gff3Export.document(refs, feats).as[String].collect()
      .filterNot(_.startsWith("##")).toSeq
    assert(concatBody == single)
  }

  test("FASTA partitioned write concatenates to the id-sorted document") {
    val df = Seq(("s2", "CGT"), ("s1", "A" * 70), ("s3", "TT")).toDF("id", "seq")
    val out = java.nio.file.Files.createTempDirectory("fastapart").toString
    Fasta.write(df, "id", "seq", out)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val lines = parts.flatMap(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath)).linesIterator)
    assert(lines.toSeq == Seq(">s1", "A" * 60, "A" * 10, ">s2", "CGT", ">s3", "TT"))
  }

  test("FASTA format wraps at 60 and round-trips through the reader") {
    val df = Seq(("s1", "A" * 70), ("s2", "CGT")).toDF("id", "seq")
    val text = Fasta.format(df.orderBy($"id"), "id", "seq").as[String].collect().mkString("\n")
    assert(text.linesIterator.toSeq ==
      Seq(">s1", "A" * 60, "A" * 10, ">s2", "CGT"))
    val back = Fasta.parseString(text).toSeq
    assert(back.map(r => r.seqId -> r.residues) ==
      Seq("s1" -> ("A" * 70), "s2" -> "CGT"))
  }

  test("GAF load resolves dictionaries, filters invalid, ranks per group") {
    val gaf = spark.createDataset(Seq(
      "db\tG1\tsym\t\tGO:1\tPMID:1\tIEA\t\tF\t\t\tgene\ttaxon:1\t20240101\tsrc\t\t",
      "db\tG1\tsym\t\tGO:1\tPMID:1\tIDA\t\tF\t\t\tgene\ttaxon:1\t20240102\tsrc\t\t",
      "db\tGX\tsym\t\tGO:1\tPMID:2\tIEA\t\tF\t\t\tgene\ttaxon:1\t20240101\tsrc\t\t")
    ).flatMap(l => Gaf.parseLine(l))
    val genes = Seq(("G1", "feat1")).toDF("gene_id", "feature_uniquename")
    val terms = Seq(("GO:1", "molecular_function")).toDF("go_id", "cv_name")
    val got = GafLoad.load(gaf, genes, terms)
      .select($"feature_uniquename", $"evidenceCode", $"rank")
      .as[(String, String, Int)].collect().toSet
    // GX fails gene lookup (P10); the two G1 rows rank 0,1 within group (A2)
    assert(got == Set(("feat1", "IDA", 0), ("feat1", "IEA", 1)))
  }

  test("duplicate-gene fan-out copies annotations to siblings (U4)") {
    val ann = Seq(("feat1", "GO:1")).toDF("feature_uniquename", "goId")
    val dup = Seq(("feat1", "feat1b")).toDF("gene_id", "sibling_id")
    val got = GafLoad.fanoutDuplicates(ann, dup)
      .as[(String, String)].collect().toSet
    assert(got == Set(("feat1", "GO:1"), ("feat1b", "GO:1")))
  }

  test("gene summary joins legacy paragraphs and converts to wiki (J12/F14)") {
    import graft.export.GeneSummary
    import graft.sinks.JdbcStore
    // two "schemas" as two Derby tables, like chado + legacy oracle
    val url = "jdbc:derby:memory:genesumdb;create=true"
    JdbcStore.write(Seq(("DDB_G1", 11L), ("DDB_G2", 12L))
      .toDF("gene_id", "paragraph_no"), url, "featureprop",
      mode = "overwrite", columnTypes = Some("gene_id VARCHAR(32)"))
    JdbcStore.write(Seq((11L, "<b>actin</b> binding"), (13L, "orphan"))
      .toDF("paragraph_no", "html"), url, "paragraph",
      mode = "overwrite", columnTypes = Some("html VARCHAR(256)"))
    val got = GeneSummary.toTsvLines(GeneSummary.export(
      JdbcStore.read(spark, url, "featureprop"),
      JdbcStore.read(spark, url, "paragraph"))).as[String].collect()
    assert(got.toSeq == Seq("DDB_G1\t'''actin''' binding")) // G2 has no paragraph
  }

  test("streaming hourly aggregation matches the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    val ev = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view", 5.0))
      .toDF("ts", "event_type", "value")
    ev.write.mode("overwrite").parquet(dir)
    val batch = EventStream.hourlyCounts(spark.read.parquet(dir))
      .select($"event_type", $"n", $"sum_value").as[(String, Long, Double)].collect().toSet
    val streamed = EventStream.runBatchAsStream(spark, dir,
      spark.read.parquet(dir).schema, "evtest")
      .select($"event_type", $"n", $"sum_value").as[(String, Long, Double)].collect().toSet
    assert(batch == streamed)
    assert(batch == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("stream-stream interval join matches the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("ssjoin").toString
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $m:00")
    val ev = Seq(
      (1L, t("10:00"), 7L, "view"),
      (2L, t("10:05"), 7L, "click"),  // joins view@10:00 (5 min before)
      (3L, t("10:20"), 7L, "click"),  // view@10:00 is 20 min old -> no match
      (4L, t("10:02"), 8L, "view"),
      (5L, t("10:04"), 9L, "click"))  // other user's view -> no match
      .toDF("event_id", "ts", "user_id", "event_type")
    ev.write.mode("overwrite").parquet(dir)
    val batch = EventStream.clickAttribution(spark.read.parquet(dir))
      .select($"click_id", $"user_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((2L, 7L)))
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.clickAttribution(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjointest").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssjointest")
      .select($"click_id", $"user_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming corpus ingest gates, dedups, and splits incrementally") {
    import graft.streaming.CorpusIngest
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    val good = ("word " * 25).trim // 25 tokens: passes the gate
    val docs = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1L, good),
      (java.sql.Timestamp.valueOf("2024-01-01 09:01:00"), 2L, good), // dup
      (java.sql.Timestamp.valueOf("2024-01-01 09:02:00"), 3L, "too short"))
      .toDF("ts", "doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = CorpusIngest.curate(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ingesttest").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ingesttest")
      .select($"doc_id", $"split").as[(Long, String)].collect()
    assert(rows.length == 1) // dup dropped, short doc gated
    assert(Set("train", "val", "test").contains(rows.head._2))
    // batch parity: same transform over the same frame (batch dedup keeps
    // one of 1/2 as well — watermarks are no-ops batch-side)
    val batch = CorpusIngest.curate(spark.read.parquet(dir))
      .select($"split").as[String].collect()
    assert(batch.length == 1 && batch.head == rows.head._2)
  }

  test("ingest dedup is Unicode-normalization-insensitive") {
    import graft.streaming.CorpusIngest
    val composed = ("caf\u00e9 " * 25).trim // e-acute as U+00E9
    val decomposed = ("cafe\u0301 " * 25).trim // e + combining acute U+0301
    val docs = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1L, composed),
      (java.sql.Timestamp.valueOf("2024-01-01 09:01:00"), 2L, decomposed))
      .toDF("ts", "doc_id", "text")
    val out = CorpusIngest.curate(docs)
      .select($"doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L)) // same text after NFC; first arrival survives
  }

  test("stream-static broadcast enrichment matches the batch join") {
    val dir = java.nio.file.Files.createTempDirectory("enrich").toString
    val events = Seq((1L, 10L), (2L, 20L), (3L, 10L), (4L, 99L))
      .toDF("event_id", "cust_id")
    events.write.mode("overwrite").parquet(dir)
    val dims = Seq((10L, "gold"), (20L, "basic")).toDF("cust_id", "tier")
    def enrich(df: org.apache.spark.sql.DataFrame) =
      df.join(broadcast(dims), Seq("cust_id"), "left_outer")
        .select($"event_id", coalesce($"tier", lit("unknown")).as("tier"))
    val batch = enrich(spark.read.parquet(dir))
      .as[(Long, String)].collect().toSet
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = enrich(stream).writeStream.outputMode("append")
      .format("memory").queryName("enrichtest").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrichtest").as[(Long, String)].collect().toSet
    assert(streamed == batch &&
      batch == Set((1L, "gold"), (3L, "gold"), (2L, "basic"), (4L, "unknown")))
  }

  test("multimodal retrieval pipeline: frames -> stub features -> kNN join") {
    import graft.operators.Similarity
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(40)
    val media = Multimodal.fromDocuments(spark, docs)
    // per-frame stub features become the embedding column; the
    // retrieval stack downstream is the REAL one (broadcast queries,
    // bounded TopK) — only the codec is fake
    val frameMedia = Multimodal.sampleFrames(media, 2)
      .map(f => Multimodal.MediaRow(
        f.media_id * 10 + f.frame_no, "frame", f.frame_payload))
    val emb = Multimodal.extractFeatures(frameMedia)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val queries = emb.filter($"vec_id" < 20L)
    val corpus = emb.filter($"vec_id" >= 20L)
    val hits = Similarity.knnJoin(corpus, queries, "vec_id", "embedding", 3)
      .as[(Long, Long, Double)].collect()
    val byQ = hits.groupBy(_._1)
    assert(byQ.values.forall(_.length == 3))
    assert(byQ.keySet == queries.select($"vec_id").as[Long].collect().toSet)
    // deterministic end-to-end: stub codec + md5-free cosine rank
    val again = Similarity.knnJoin(corpus, queries, "vec_id", "embedding", 3)
      .as[(Long, Long, Double)].collect()
    assert(again.map(r => (r._1, r._2)).toSet == hits.map(r => (r._1, r._2)).toSet)
  }

  test("CDC streaming merge applies upsert + delete, last-marker-wins") {
    val in = java.nio.file.Files.createTempDirectory("cdc-in").toString
    val store = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    val b1 = Seq(
      (1L, "v1", "I", 10L),
      (2L, "v2", "I", 11L),
      (2L, "v2b", "U", 12L), // same batch: later seq wins
      (3L, "v3", "I", 13L))
      .toDF("id", "v", "op", "seq")
    b1.write.mode("append").parquet(in)
    val q = graft.streaming.StreamingMerge.cdcMerge(
      spark, in, b1.schema, store, Seq("id"), "op", "seq")
    q.processAllAvailable()
    val after1 = spark.read.parquet(store)
      .as[(Long, String)].collect().toSet
    assert(after1 == Set((1L, "v1"), (2L, "v2b"), (3L, "v3")))
    // batch 2: delete 1, update 3, insert 4
    Seq((1L, "x", "D", 20L), (3L, "v3b", "U", 21L), (4L, "v4", "I", 22L))
      .toDF("id", "v", "op", "seq")
      .write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    val after2 = spark.read.parquet(store)
      .as[(Long, String)].collect().toSet
    assert(after2 == Set((2L, "v2b"), (3L, "v3b"), (4L, "v4")))
  }

  test("streaming agg maintenance: store equals full aggregate across batches") {
    import graft.operators.IncrementalAgg
    val in = java.nio.file.Files.createTempDirectory("aggm-in").toString
    val store = java.nio.file.Files.createTempDirectory("aggm").toString + "/partials"
    val b1 = Seq(("a", 1.5), ("a", 2.0), ("b", 3.25)).toDF("k", "v")
    val b2 = Seq(("a", 0.25), ("c", 7.0)).toDF("k", "v")
    b1.write.mode("append").parquet(in)
    val q = graft.streaming.StreamingMerge.aggMaintain(
      spark, in, b1.schema, store, Seq("k"), "v",
      java.nio.file.Files.createTempDirectory("aggm-ckpt").toString)
    q.processAllAvailable()
    b2.write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    val got = IncrementalAgg.finish(spark.read.parquet(store), Seq("k"))
      .as[(String, Double, Long)].collect().toSet
    // full-batch truth over all rows ever streamed
    val full = IncrementalAgg.finish(
      IncrementalAgg.partial(b1.unionByName(b2), Seq("k"), "v"), Seq("k"))
      .as[(String, Double, Long)].collect().toSet
    assert(got == full)
    assert(got == Set(("a", 3.75, 3L), ("b", 3.25, 1L), ("c", 7.0, 1L)))
  }

  test("agg maintenance skips replayed micro-batches (at-least-once safe)") {
    import graft.operators.IncrementalAgg
    import graft.streaming.StreamingMerge
    val store = java.nio.file.Files.createTempDirectory("aggr").toString + "/p"
    val b0 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val b1 = Seq(("a", 4.0)).toDF("k", "v")
    assert(StreamingMerge.applyAggBatch(b0, 0L, store, Seq("k"), "v"))
    assert(StreamingMerge.applyAggBatch(b1, 1L, store, Seq("k"), "v"))
    def state() = IncrementalAgg.finish(spark.read.parquet(store), Seq("k"))
      .as[(String, Double, Long)].collect().toSet
    val before = state()
    assert(before == Set(("a", 5.0, 2L), ("b", 2.0, 1L)))
    // crash-replay of batch 1 (store written, checkpoint not committed):
    // the _applied_batch gate skips it — no double count
    assert(!StreamingMerge.applyAggBatch(b1, 1L, store, Seq("k"), "v"))
    assert(state() == before)
    // later batches still fold
    assert(StreamingMerge.applyAggBatch(Seq(("b", 1.0)).toDF("k", "v"),
      2L, store, Seq("k"), "v"))
    assert(state() == Set(("a", 5.0, 2L), ("b", 3.0, 2L)))
  }

  test("streaming exact dedup drops watermark-window duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("dedupstream").toString
    val docs = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "same text"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 2L, "same text"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), 3L, "other text"))
      .toDF("ts", "doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.dedupStream(stream, "ts", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduptest").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("deduptest").select($"doc_id").as[Long].collect().toSet
    assert(kept.size == 2 && kept.contains(3L)) // one of 1/2 + doc 3
  }

  test("stateful streaming sessionization emits closed sessions per user") {
    val evs = Seq(
      EventStream.Event(1L, 0L, "a"),
      EventStream.Event(1L, 100L, "b"),
      EventStream.Event(1L, 4000L * 1000 * 1000, "c"), // > 30 min later
      EventStream.Event(2L, 0L, "x")) // never closed -> stays in state
    val got = EventStream.sessionize(spark.createDataset(evs)).collect()
    // user 1's first session (2 events, 100us) is closed by event c;
    // the running sessions (c, and user 2's) remain in state, unemitted
    assert(got.toSeq == Seq(EventStream.SessionOut(1L, 2, 100L)))
  }

  test("streaming sessionization times out idle keys: final session emitted, state freed") {
    val dir = java.nio.file.Files.createTempDirectory("sesstream").toString
    def write(name: String, evs: Seq[EventStream.Event]): Unit =
      spark.createDataset(evs).repartition(1)
        .write.mode("overwrite").parquet(s"$dir/$name")
    // timestamps sit well above epoch: the initial watermark is 0 and
    // stateful operators drop rows at-or-below it as late
    val base = 1700000000L * 1000 * 1000
    // batch 1: user 1 has a 2-event session; nothing closes it in-batch
    write("b1", Seq(EventStream.Event(1L, base, "a"),
      EventStream.Event(1L, base + 100L, "b")))
    val stream = spark.readStream
      .schema(spark.createDataset(Seq.empty[EventStream.Event]).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val q = EventStream.sessionize(stream.as[EventStream.Event])
      .writeStream.outputMode("append")
      .format("memory").queryName("sesstimeout").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sesstimeout").count() == 0) // still open
      // batch 2: another user far in the future advances the watermark
      // past user 1's last + gap -> the event-time timeout fires and
      // user 1's FINAL session is emitted (NoTimeout never would)
      write("b2", Seq(EventStream.Event(2L, base + 8000L * 1000 * 1000, "x")))
      q.processAllAvailable()
      q.processAllAvailable() // one more cycle: timeout fires after the watermark commit
      val got = spark.table("sesstimeout")
        .as[EventStream.SessionOut].collect().toSet
      assert(got.contains(EventStream.SessionOut(1L, 2, 100L)), s"got $got")
    } finally q.stop()
  }

  test("multimodal image path decodes a REAL png via javax.imageio") {
    // generate an actual 20x10 PNG: left half black, right half white
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "audio", Array[Byte](1, 2, 3)))) // no JDK codec
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    val f1 = feats(1L)
    // real header metadata, not byte-derived fakes
    assert(f1.format == "png" && f1.width == 20 && f1.height == 10)
    assert(f1.header_hex == "89504E47") // the actual PNG magic
    // luminance histogram: half the pixels darkest bin, half lightest
    assert(f1.features.head == 0.5f && f1.features.last == 0.5f)
    assert(math.abs(f1.features.sum - 1.0f) < 1e-6)
    // undecodable bytes stay on the documented stub path
    assert(feats(2L).format == "stub")
    // real resize: dims scale, payload is a re-encoded PNG of the new size
    val resized = Multimodal.resize(media, 10).collect()
      .map(r => r.media_id -> r).toMap
    assert(resized(1L).width == 10 && resized(1L).height == 5)
    val reDecoded = Multimodal.ImageCodec.decode(resized(1L).payload)
    assert(reDecoded.exists { case (fmt, i) =>
      fmt == "png" && i.getWidth == 10 && i.getHeight == 5 })
  }

  test("multimodal audio path decodes real WAV metadata and PCM amplitudes") {
    // a real 16-bit mono PCM WAV, generated with the same JDK API:
    // 800 frames of a loud square wave at 8 kHz
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](800 * 2)
    for (i <- 0 until 800) {
      val s: Short = if (i % 20 < 10) 30000 else -30000
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val media = spark.createDataset(Seq(Multimodal.MediaRow(7L, "audio", wav)))
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.format == "wave" && f.sample_rate == 8000 &&
      f.channels == 1 && f.n_frames == 800)
    assert(f.header_hex == "52494646") // the actual RIFF magic
    // every sample is |30000| -> the 30000*8/32768 = 7th bin holds all
    assert(f.features(7) == 1.0f && math.abs(f.features.sum - 1.0f) < 1e-6)
    assert(f.width == 0 && f.height == 0) // image fields vacant on audio
  }

  test("frame sampling decodes REAL frames from an animated GIF") {
    // build a 4-frame animated GIF with the JDK's own gif sequence
    // writer: each frame a solid 8x8 gray level (40*i per channel)
    val frames = (0 until 4).map { i =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(40 * i, 40 * i, 40 * i))
        g.fillRect(0, 0, 8, 8)
      } finally g.dispose()
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(
      new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray

    val media = spark.createDataset(Seq(Multimodal.MediaRow(9L, "video", gif)))
    // n=2 over 4 frames samples source indices 0 and 2, decoded for real
    val sampled = Multimodal.sampleFrames(media, 2).collect().sortBy(_.frame_no)
    assert(sampled.map(_.offset).toSeq == Seq(0L, 2L))
    val decoded = sampled.map(f => Multimodal.ImageCodec.decode(f.frame_payload))
    assert(decoded.forall(_.isDefined), "sampled frames are real decodable PNGs")
    val imgs = decoded.map(_.get)
    assert(imgs.forall { case (fmt, img) =>
      fmt == "png" && img.getWidth == 8 && img.getHeight == 8 })
    // frame 0 is black, frame 2 is gray(80): the pixels prove these are
    // DIFFERENT real frames, not byte slices
    def lum(img: java.awt.image.BufferedImage) = img.getRGB(4, 4) & 0xff
    assert(lum(imgs(0)._2) == 0 && lum(imgs(1)._2) == 80)
    // oversampling never duplicates: 4 distinct frames from n=8
    assert(Multimodal.sampleFrames(media, 8).collect().length == 4)
  }

  test("frame sampling decodes REAL frames from a raw MJPEG stream") {
    // a raw MJPEG video stream is concatenated JPEGs (the IP-camera
    // format): build 5 frames with distinct gray levels, jpeg-encode
    // each with the JDK writer, and concatenate
    def jpeg(level: Int): Array[Byte] =
      graft.multimodal.MediaFixtures.solidJpeg(8, 8, level)
    val stream = (0 until 5).map(i => jpeg(50 * i)).reduce(_ ++ _)

    // the marker scan indexes 5 frames without decoding any
    val idx = Multimodal.MjpegCodec.frameIndex(stream)
    assert(idx.length == 5)
    assert(idx.head._1 == 0 && idx.last._2 == stream.length)

    val media = spark.createDataset(Seq(Multimodal.MediaRow(11L, "video", stream)))
    // n=2 over 5 frames samples source indices 0 and 2, decoded for real
    val sampled = Multimodal.sampleFrames(media, 2).collect().sortBy(_.frame_no)
    assert(sampled.map(_.offset).toSeq == Seq(0L, 2L))
    val decoded = sampled.map(f => Multimodal.ImageCodec.decode(f.frame_payload))
    assert(decoded.forall(_.isDefined), "sampled frames are real decodable PNGs")
    val imgs = decoded.map(_.get)
    assert(imgs.forall { case (fmt, img) =>
      fmt == "png" && img.getWidth == 8 && img.getHeight == 8 })
    // frame 0 is black, frame 2 is gray(100) ± jpeg loss: the pixels
    // prove these are DIFFERENT real frames of the stream
    def lum(img: java.awt.image.BufferedImage) = img.getRGB(4, 4) & 0xff
    assert(lum(imgs(0)._2) < 20 && math.abs(lum(imgs(1)._2) - 100) < 20)
    // oversampling never duplicates: 5 distinct frames from n=8
    assert(Multimodal.sampleFrames(media, 8).collect().length == 5)
    // a single JPEG is an image, not a stream: the MJPEG codec declines
    assert(Multimodal.MjpegCodec.sampleFrames(jpeg(0), 2).isEmpty)
    // feature extraction reports the stream as VIDEO: mjpeg format,
    // marker-indexed frame count, dims from one decoded frame
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.format == "mjpeg" && f.n_frames == 5
      && f.width == 8 && f.height == 8)
  }

  test("MP4 mux/demux round-trips real frames through the ISO-BMFF sample table") {
    def jpeg(level: Int): Array[Byte] =
      graft.multimodal.MediaFixtures.solidJpeg(8, 8, level)
    // an MJPEG capture normalized into a seekable container: 6 distinct
    // pre-encoded JPEG frames muxed without transcoding
    val frames = (0 until 6).map(i => jpeg(40 * i))
    val mp4 = Mp4Codec.mux(frames, 8, 8, fps = 10)

    // the parse is the REAL box walk: brand, movie timescale/duration,
    // track handler/codec/dims, and the resolved stsz/stsc/stco layout
    val meta = Mp4Codec.parse(mp4).get
    assert(meta.brand == "isom")
    assert(meta.timescale == 10 && meta.duration == 6)
    val v = meta.video.get
    assert(v.codec == "jpeg" && v.width == 8 && v.height == 8)
    assert(v.sampleSizes.map(_.toInt) == frames.map(_.length))

    // demuxed samples are byte-identical to what was muxed, at true
    // mdat offsets — and each is a genuinely decodable JPEG
    val extracted = Mp4Codec.sampleFrames(mp4, 6).get
    assert(extracted.map(_._2.toSeq) == frames.map(_.toSeq))
    assert(extracted.forall { case (_, b) =>
      Multimodal.ImageCodec.decode(b).exists(_._1 == "jpeg") })

    // non-mp4 and truncated payloads decline instead of throwing
    assert(Mp4Codec.parse("plainly not an mp4".getBytes).isEmpty)
    assert(Mp4Codec.parse(mp4.take(40)).isEmpty)

    // the Spark feature path reports real container metadata
    val media = spark.createDataset(Seq(Multimodal.MediaRow(12L, "video", mp4)))
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.format == "mp4/jpeg" && f.n_frames == 6
      && f.width == 8 && f.height == 8)

    // the Spark sampling path: n=2 over 6 samples source frames 0 and
    // 3, offsets are the samples' real byte positions, pixels prove the
    // frames are distinct
    val sampled = Multimodal.sampleFrames(media, 2).collect().sortBy(_.frame_no)
    assert(sampled.map(_.offset).toSeq ==
      Seq(extracted(0)._1, extracted(3)._1))
    val dec = sampled.map(s => Multimodal.ImageCodec.decode(s.frame_payload))
    assert(dec.forall(_.exists(_._1 == "jpeg")))
    def lum(img: java.awt.image.BufferedImage) = img.getRGB(4, 4) & 0xff
    assert(lum(dec(0).get._2) < 20 && math.abs(lum(dec(1).get._2) - 120) < 20)
  }

  test("Matroska mux/demux round-trips real frames through EBML SimpleBlocks") {
    def jpeg(level: Int): Array[Byte] =
      graft.multimodal.MediaFixtures.solidJpeg(8, 8, level)
    // V_MJPEG is Matroska's registered Motion-JPEG codec id: complete
    // JPEGs as block payloads, no transcode
    val frames = (0 until 5).map(i => jpeg(45 * i))
    val mkv = EbmlCodec.mux(frames, 8, 8, fps = 10)

    // the parse is the REAL EBML walk: DocType, timecode scale,
    // duration, track type/codec/dims, per-track SimpleBlock count
    val meta = EbmlCodec.parse(mkv).get
    assert(meta.docType == "matroska")
    assert(meta.timecodeScale == 1000000L)
    assert(meta.durationTicks == 500.0) // 5 frames / 10 fps in ms ticks
    val v = meta.video.get
    assert(v.codecId == "V_MJPEG" && v.width == 8 && v.height == 8)
    assert(meta.nVideoBlocks == 5)

    // demuxed block payloads are byte-identical to the muxed frames
    // and each is a genuinely decodable JPEG
    val extracted = EbmlCodec.sampleFrames(mkv, 5).get
    assert(extracted.map(_._2.toSeq) == frames.map(_.toSeq))
    assert(extracted.forall { case (_, b) =>
      Multimodal.ImageCodec.decode(b).exists(_._1 == "jpeg") })

    // non-EBML and truncated payloads decline instead of throwing
    assert(EbmlCodec.parse("certainly not matroska".getBytes).isEmpty)
    assert(EbmlCodec.parse(mkv.take(30)).isEmpty)

    // the Spark feature path reports real container metadata
    val media = spark.createDataset(Seq(Multimodal.MediaRow(13L, "video", mkv)))
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.format == "matroska/V_MJPEG" && f.n_frames == 5
      && f.width == 8 && f.height == 8)

    // the Spark sampling path: n=2 over 5 blocks samples source frames
    // 0 and 2 at their true file offsets; pixels prove distinct frames
    val sampled = Multimodal.sampleFrames(media, 2).collect().sortBy(_.frame_no)
    assert(sampled.map(_.offset).toSeq ==
      Seq(extracted(0)._1, extracted(2)._1))
    val dec = sampled.map(s => Multimodal.ImageCodec.decode(s.frame_payload))
    assert(dec.forall(_.exists(_._1 == "jpeg")))
    def lum(img: java.awt.image.BufferedImage) = img.getRGB(4, 4) & 0xff
    assert(lum(dec(0).get._2) < 20 && math.abs(lum(dec(1).get._2) - 90) < 20)
  }

  test("multimodal stub pipeline extracts deterministic features") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.n_bytes == 11)
    assert(f.header_hex == "68656C6C".toUpperCase) // "hell"
    assert(f.width == 16 + 'h'.toInt)
    assert(f.features.length == 8)
    // determinism: same input -> same features
    val again = Multimodal.extractFeatures(media).collect().head
    assert(again.features.toSeq == f.features.toSeq)
    // resize caps the longer dimension, preserving aspect
    val resized = Multimodal.resize(media, 32).collect().head
    assert(math.max(resized.width, resized.height) <= 32 && resized.width >= 1)
    // frame sampling: n rows with monotonically increasing offsets
    val frames = Multimodal.sampleFrames(media, 4).collect().sortBy(_.frame_no)
    assert(frames.length == 4)
    assert(frames.map(_.offset).toSeq == frames.map(_.offset).toSeq.sorted)
    assert(frames.forall(_.frame_payload.nonEmpty))
  }
}
