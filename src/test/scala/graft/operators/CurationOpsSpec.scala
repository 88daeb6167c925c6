package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-4 curation additions: regex scrub
  * (PII), known-bigram fluency, mixture resampling, shard assignment,
  * segment dedup, and the bounded TopK aggregator behind knnJoin. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateSpans finds cross-doc sliding windows at any offset") {
    // docs 1 and 2 share the run "x y z w" at DIFFERENT offsets (aligned
    // chunk dedup would miss it); doc 3 has no cross-doc span; doc 4 is
    // too short and is excluded entirely
    val docs = Seq(
      (1L, "x y z w a b"), //  spans@3: xyz yzw zwa wab
      (2L, "q x y z w c"), //  spans@3: qxy xyz yzw zwc
      (3L, "m n o p r s"),
      (4L, "t u")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // shared hashes: "x y z" (docs 1+2), "y z w" (docs 1+2)
    // doc 1: spans at pos 1,2 -> tokens 1..4 covered (x y z w)
    // doc 2: spans at pos 2,3 -> tokens 2..5 covered
    assert(got == Seq(
      (1L, 6L, 2L, 4L, 0.666667), // dup_frac rounds to 6 decimals
      (2L, 6L, 2L, 4L, 0.666667),
      (3L, 6L, 0L, 0L, 0.0)))
  }

  test("linearScore: broadcast weights, decimal-exact sums, bias fallback") {
    val docs = Seq(
      (1L, "good good bad"), // 2*0.5 - 0.25 = 0.75
      (2L, "nothing matches here")).toDF("doc_id", "text")
    val got = Curation.linearScore(docs, "doc_id", "text",
        Seq("good" -> 0.5, "bad" -> -0.25), bias = 0.1)
      .orderBy($"doc_id").as[(Long, Long, Double)].collect().toSeq
    def sig(x: Double) = BigDecimal(1.0 / (1.0 + math.exp(-x)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 3L, sig(0.1 + 0.75)), (2L, 0L, sig(0.1))))
  }

  test("scrub redacts PII patterns and collapses whitespace") {
    val docs = Seq(
      (1L, "mail me at alice.smith+x@example.co.uk  today"),
      (2L, "server 192.168.0.1 responded"),
      (3L, "call 555-123-4567 now"), // contiguous digit run, no inner spaces
      (4L, "no pii here")
    ).toDF("doc_id", "text")
    val got = Curation.scrub(docs, "text", Curation.piiPatterns)
      .select($"doc_id", $"clean").as[(Long, String)].collect().toMap
    assert(got(1L) == "mail me at today")
    assert(got(2L) == "server responded")
    assert(!got(3L).exists(_.isDigit))
    assert(got(4L) == "no pii here")
  }

  test("knownBigramRatio counts corpus-supported bigram occurrences") {
    // "a b" occurs 3x corpus-wide (docs 1,1,2); "b c" once; doc 3 too short
    val docs = Seq(
      (1L, "a b a b"), // bigrams: a b, b a, a b
      (2L, "a b c"),   // bigrams: a b, b c
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = Curation.knownBigramRatio(docs, "doc_id", "text", 3L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3L, 2L))) // 3 bigrams, "a b" x2 known
    assert(got(2L) == ((2L, 1L)))
    assert(got(3L) == ((0L, 0L)))
  }

  test("resampleToMixture hits target weights and is deterministic") {
    val docs = (0L until 900L).map(i => (i, if (i < 600) "en" else "fr"))
      .toDF("doc_id", "lang")
    val weights = Map("en" -> 0.5, "fr" -> 0.5)
    // fr binds: nstar = 300/0.5 = 600 -> en rate 0.5, fr rate 1.0
    val kept = Curation.resampleToMixture(docs, "lang", "doc_id", weights)
    val byLang = kept.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(byLang("fr") >= 299L) // rate==1 modulo FP epsilon on the md5 edge
    // en kept should be close to 300 of 600 (hash threshold at rate 0.5)
    assert(byLang("en") > 240L && byLang("en") < 360L)
    // deterministic: second run keeps the identical id set
    val ids1 = kept.select($"doc_id").as[Long].collect().toSet
    val ids2 = Curation.resampleToMixture(docs, "lang", "doc_id", weights)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // strata without a weight are dropped
    val extra = docs.unionByName(Seq((9999L, "zz")).toDF("doc_id", "lang"))
    assert(Curation.resampleToMixture(extra, "lang", "doc_id", weights)
      .filter($"lang" === "zz").count() == 0L)
  }

  test("shardAssign is balanced-ish, deterministic, and in range") {
    val docs = (0L until 2000L).toDF("doc_id")
    val byShard = Curation.shardAssign(docs, "doc_id", 8)
      .groupBy($"shard").count().as[(Int, Long)].collect().toMap
    assert(byShard.keySet == (0 until 8).toSet)
    // md5 is uniform: each shard ~250 of 2000
    assert(byShard.values.forall(c => c > 150 && c < 350))
    val again = Curation.shardAssign(docs, "doc_id", 8)
      .groupBy($"shard").count().as[(Int, Long)].collect().toMap
    assert(again == byShard)
  }

  test("segmentDedup flags repeated windows, keeps first occurrence") {
    val seg = "w1 w2 w3 w4" // 4-token window shared verbatim
    val docs = Seq(
      (1L, s"$seg unique1 a b c"),
      (2L, s"$seg unique2 d e f")
    ).toDF("doc_id", "text")
    val flagged = Dedup.segmentDedup(docs, "doc_id", "text", 4)
      .select($"doc_id", $"seg_idx", $"dup").as[(Long, Long, Boolean)]
      .collect().toSet
    // doc 1 seg 0 is the first occurrence; doc 2 seg 0 is the dup
    assert(flagged.contains((1L, 0L, false)))
    assert(flagged.contains((2L, 0L, true)))
    // tails differ -> not dups
    assert(flagged.filter(_._2 == 1L).forall(!_._3))
  }

  test("TopK aggregator == window row_number top-k on random data") {
    val rnd = new scala.util.Random(7)
    // NaN scores included: SQL DESC (and DuckDB) rank NaN above every
    // finite value, and the aggregator must agree, not drop them
    val scored = (Seq.tabulate(500) { i =>
      (i % 5L, i.toLong, math.round(rnd.nextDouble() * 1e6) / 1e6)
    } ++ Seq((0L, 9000L, Double.NaN), (1L, 9001L, Double.NaN)))
      .toDF("g", "id", "s")
    // NaN != NaN under Scala tuple equality — compare via a sentinel
    def norm(t: (Long, Long, Double)) =
      (t._1, t._2, if (t._3.isNaN) -999.0 else t._3)
    val viaAgg = scored.groupBy($"g")
      .agg(graft.functions.TopK.top_k(7)($"id", $"s").as("hits"))
      .select($"g", explode($"hits").as("h"))
      .select($"g", $"h._1".as("id"), $"h._2".as("s"))
      .as[(Long, Long, Double)].collect().map(norm).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"s".desc, $"id")
    val viaWindow = scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 7).drop("rn")
      .as[(Long, Long, Double)].collect().map(norm).toSet
    assert(viaAgg == viaWindow && viaAgg.size == 35)
    assert(viaAgg.count(_._3 == -999.0) == 2, "NaN rows must survive into the top-k")
  }

  test("edge cases: empty inputs, k > corpus, single-stratum mixture") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.scrub(emptyDocs, "text", Curation.piiPatterns).count() == 0L)
    assert(Curation.knownBigramRatio(emptyDocs, "doc_id", "text", 5L).count() == 0L)
    assert(Dedup.segmentDedup(emptyDocs, "doc_id", "text", 10).count() == 0L)
    assert(Curation.resampleToMixture(
      emptyDocs.withColumn("lang", lit("en")), "lang", "doc_id",
      Map("en" -> 1.0)).count() == 0L)
    // k larger than the corpus: every candidate comes back, no padding
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val tiny = emb.filter($"vec_id" >= 5 && $"vec_id" < 9)
    val hits = Similarity.knnJoin(tiny, emb.filter($"vec_id" === 0L),
      "vec_id", "embedding", 100)
    assert(hits.count() == 4L)
    // one stratum at weight 1.0 keeps everything (rate == 1 branch)
    val one = (0L until 50L).map((_, "en")).toDF("doc_id", "lang")
    assert(Curation.resampleToMixture(one, "lang", "doc_id",
      Map("en" -> 1.0)).count() == 50L)
    // docs shorter than the segment window yield one partial segment
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    val segs = Dedup.segmentDedup(short, "doc_id", "text", 10)
      .select($"seg_idx", $"segment", $"dup").as[(Long, String, Boolean)].collect()
    assert(segs.toSeq == Seq((0L, "a b", false)))
  }

  test("negativeSample: k negatives per anchor, never self, deterministic") {
    val docs = (0L until 200L).toDF("doc_id")
    val negs = Curation.negativeSample(docs, "doc_id", 5, 32)
      .as[(Long, Long, Long)].collect()
    val byAnchor = negs.groupBy(_._1)
    assert(byAnchor.size == 200 && byAnchor.values.forall(_.length == 5))
    assert(negs.forall { case (a, n, _) => a != n })
    assert(byAnchor.values.forall(_.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    // anchors draw DIFFERENT negatives (per-anchor hash ranking, not
    // everyone sharing the pool head)
    assert(byAnchor.values.map(_.map(_._2).toSet).toSet.size > 100)
    val again = Curation.negativeSample(docs, "doc_id", 5, 32)
      .as[(Long, Long, Long)].collect().toSet
    assert(again == negs.toSet)
  }

  test("incremental agg: merged partials == full aggregate, any split/order") {
    val rows = Seq.tabulate(300)(i =>
      (s"k${i % 3}", (i % 7) + 0.25)).toDF("k", "v")
    def got(parts: Seq[org.apache.spark.sql.DataFrame]) =
      IncrementalAgg.finish(IncrementalAgg.merge(parts, Seq("k")), Seq("k"))
        .as[(String, Double, Long)].collect().toSet
    val full = got(Seq(IncrementalAgg.partial(rows, Seq("k"), "v")))
    val a = IncrementalAgg.partial(rows.filter($"v" < 3), Seq("k"), "v")
    val b = IncrementalAgg.partial(rows.filter($"v" >= 3 && $"v" < 5), Seq("k"), "v")
    val c = IncrementalAgg.partial(rows.filter($"v" >= 5), Seq("k"), "v")
    assert(got(Seq(a, b, c)) == full)
    assert(got(Seq(c, a, b)) == full) // order-insensitive (decimal-exact)
  }

  test("incremental agg: CDC retractions are exact, emptied keys drop out") {
    val before = Seq(("a", 1.5), ("a", 2.25), ("b", 4.0), ("c", 7.0))
      .toDF("k", "v")
    val after = Seq(("a", 1.5), ("b", 4.0), ("b", 9.75), ("d", 3.0))
      .toDF("k", "v")
    val changes = // what VersionedStore.rowDiff(before -> after) reports
      Seq(("b", 9.75, "added"), ("d", 3.0, "added"),
        ("a", 2.25, "removed"), ("c", 7.0, "removed"))
        .toDF("k", "v", "change")
    val refreshed = IncrementalAgg.finish(
      IncrementalAgg.applyChanges(
        IncrementalAgg.partial(before, Seq("k"), "v"), changes, Seq("k"), "v"),
      Seq("k")).as[(String, Double, Long)].collect().toSet
    val direct = IncrementalAgg.finish(
      IncrementalAgg.merge(Seq(IncrementalAgg.partial(after, Seq("k"), "v")),
        Seq("k")), Seq("k")).as[(String, Double, Long)].collect().toSet
    assert(refreshed == direct)
    assert(!refreshed.exists(_._1 == "c"), "fully-retracted key must drop out")
  }

  test("corpusmix composition: scrub -> resample -> shard-partitioned write") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val w = Map("en" -> 0.25, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.15, "zh" -> 0.2)
    val scrubbed = Curation.scrub(docs, "text", Curation.piiPatterns)
      .drop("text").withColumnRenamed("clean", "text")
    val sharded = Curation.shardAssign(
      Curation.resampleToMixture(scrubbed, "lang", "doc_id", w), "doc_id", 4)
    val out = java.nio.file.Files.createTempDirectory("corpusmix").toString
    sharded.repartition(4, $"shard")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out)
    assert((0 until 4).forall { sh =>
      val d = new java.io.File(s"$out/shard=$sh")
      // co-located write: exactly one data file per shard directory
      d.isDirectory &&
        d.listFiles().count(_.getName.endsWith(".parquet")) == 1
    })
    // achieved mixture ~ target ratios (binding stratum keeps all)
    val byLang = back.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val total = byLang.values.sum.toDouble
    w.foreach { case (l, wt) =>
      assert(math.abs(byLang(l) / total - wt) < 0.05, s"$l off-target")
    }
    // re-run writes the identical id set
    val ids1 = back.select($"doc_id").as[Long].collect().toSet
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out)
    val ids2 = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("prefix-filtered jaccard == inverted-index jaccard (exact)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_a", $"doc_b", round($"jaccard", 9).as("j"))
        .as[(Long, Long, Double)].collect().toSet
    val viaIndex = norm(Dedup.jaccardPairsFromDocs(
      docs, "doc_id", "text", 3, 0.35, maxDf = Long.MaxValue))
    val viaPrefix = norm(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.35))
    assert(viaPrefix == viaIndex && viaIndex.nonEmpty)
    val viaHashOrder = norm(Dedup.jaccardPairsPrefix(
      docs, "doc_id", "text", 3, 0.35, rareFirst = false))
    assert(viaHashOrder == viaIndex)
    // lower threshold too (more pairs, exercises the length filter)
    val lo = norm(Dedup.jaccardPairsFromDocs(
      docs, "doc_id", "text", 2, 0.2, maxDf = Long.MaxValue))
    val loP = norm(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 2, 0.2))
    assert(loP == lo)
  }

  test("similarityGate: stateless stream == batch, ties to lowest qid") {
    val dir = java.nio.file.Files.createTempDirectory("simgate").toString
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    emb.filter($"vec_id" >= 5).write.mode("overwrite").parquet(dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val batch = Similarity.similarityGate(
        spark.read.parquet(dir), queries, "embedding", 0.2)
      .select($"vec_id", $"best_query", $"sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    // identical plan over a stream, append mode, no watermark needed
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = Similarity.similarityGate(stream, queries, "embedding", 0.2)
      .select($"vec_id", $"best_query", $"sim")
      .writeStream.outputMode("append")
      .format("memory").queryName("simgatetest").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("simgatetest")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch)
    // a row equally close to two queries tags the lowest query id
    val tied = Seq((100L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val twin = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 0f))).map {
      case (i, v) => (i, v: Seq[Float])
    }
    val best = Similarity.similarityGate(tied, twin, "embedding", 0.5)
      .select($"best_query").as[Long].head()
    assert(best == 0L)
  }

  test("knnJoin returns k exact neighbors per query, ranked") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.knnJoin(
      emb.filter($"vec_id" >= 3), emb.filter($"vec_id" < 3),
      "vec_id", "embedding", 5)
    val rows = got.as[(Long, Long, Double)].collect()
    assert(rows.length == 15)
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L) && byQ.values.forall(_.length == 5))
    // per query, sims match the single-query brute-force operator
    val single = Similarity.cosineTopK(
      emb.filter($"vec_id" >= 3 || $"vec_id" === 0L), "vec_id", "embedding", 0L, 5)
      .as[(Long, Double)].collect().toSet
    assert(byQ(0L).map(r => (r._2, r._3)).toSet == single)
  }

  test("lmScore: typical text outscores gibberish; bigram counts exact; short docs omitted") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "zqxj kvvw pzfq xqzj zzzz"), // bigrams the corpus never repeats
      (4L, "x")                         // one char: no bigrams, omitted
    ).toDF("doc_id", "text")
    val got = Curation.lmScore(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), "doc 4 has no bigrams")
    // n_bigrams = chars - 1 (lowercased text, spaces count)
    assert(got.map(_._2).toSeq == Seq(21L, 21L, 23L))
    val score = got.map(r => r._1 -> r._3).toMap
    assert(score(3L) < score(1L) && score(3L) < score(2L),
      s"gibberish must sit in the left tail: $score")
    // self-trained model: every log-prob is negative, so means are too
    assert(got.forall(_._3 < 0.0))
    // case-folding: scoring is over lower(text)
    val uppercased = Curation.lmScore(
      docs.withColumn("text", upper($"text")), "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(uppercased.toSeq == got.toSeq)
  }

  test("htmlToText strips blocks/tags, decodes entities, never leaks markup") {
    def x(h: String): String = {
      val df = Seq(h).toDF("h")
        .select(Curation.htmlToText($"h").as("t"))
      df.as[String].head()
    }
    assert(x("<p>plain</p>") == "plain")
    // script/style vanish wholesale, including '<' inside the script
    assert(x("<script>if (1 < 2) alert('x')</script>keep<style>p{}</style>") == "keep")
    assert(x("<!-- gone --><b>bold</b> text") == "bold text")
    // entity order: &amp;lt; must decode to the literal string "&lt;"
    assert(x("a &amp;lt; b &amp; c &lt;d&gt;") == "a &lt; b & c <d>")
    // unclosed script over-strips (documented degradation), never leaks tags
    assert(!x("<script>var a=1; trailing").contains("<"))
    // whitespace collapses across removed nodes
    assert(x("<div>\n  a\n\n<span> b </span>\t</div>") == "a b")
  }

  test("urlHost lowercases, strips www and port, declines junk") {
    val urls = Seq(
      "https://www.Example.COM/doc/1", "http://news.site.org:8080/a?id=2",
      "https://sub.www.host.net/x", "ftp://files.example.com/a",
      "not a url", "").toDF("u")
    val got = urls.select(Curation.urlHost($"u").as("h"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("example.com"), Some("news.site.org"),
      Some("sub.www.host.net"), None, None, None))
  }

  test("urlNormalize collapses surface variants to one canonical form") {
    def n(u: String): String =
      Seq(u).toDF("u").select(Curation.urlNormalize($"u")).as[String].head()
    // scheme+host lowercased, path case preserved
    assert(n("HTTPS://EXAMPLE.COM/Article/9") == "https://example.com/Article/9")
    // default ports stripped, non-default kept
    assert(n("https://example.com:443/a") == "https://example.com/a")
    assert(n("http://example.com:80/a") == "http://example.com/a")
    assert(n("http://example.com:8080/a") == "http://example.com:8080/a")
    // www, fragment, trailing slash
    assert(n("https://www.example.com/a/#top") == "https://example.com/a")
    // tracking params removed wherever they sit; real params survive
    assert(n("https://h.io/p?utm_source=x&id=7") == "https://h.io/p?id=7")
    assert(n("https://h.io/p?id=7&utm_source=x") == "https://h.io/p?id=7")
    assert(n("https://h.io/p?utm_source=x&utm_medium=y") == "https://h.io/p")
    assert(n("https://h.io/p?gclid=abc") == "https://h.io/p")
    // the six-variant q134 family really collapses
    val variants = Seq(
      "https://www.Example.com/Article/7",
      "https://example.com:443/Article/7",
      "HTTPS://EXAMPLE.COM/Article/7#section")
    assert(variants.map(n).distinct == Seq("https://example.com/Article/7"))
  }

  test("extractLinks pulls every double-quoted href, case-insensitive, in order") {
    val html = """<a href="https://a.com/1">x</a><A HREF="/rel/2">y</A>""" +
      """<a class="z" href="http://b.net/3?q=1">w</a><a name="no-href">v</a>"""
    val got = Seq(html).toDF("h")
      .select(Curation.extractLinks($"h").as("l")).as[Seq[String]].head()
    assert(got == Seq("https://a.com/1", "/rel/2", "http://b.net/3?q=1"))
    // no hrefs -> empty array, not null
    assert(Seq("<p>none</p>").toDF("h")
      .select(Curation.extractLinks($"h")).as[Seq[String]].head().isEmpty)
  }

  test("allocateBudget: largest-remainder seats sum exactly, ties by name") {
    def alloc(counts: Seq[(String, Long)], budget: Long): Map[String, Long] =
      Curation.allocateBudget(counts.toDF("domain", "n"), "domain", "n", budget)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    // classic Hamilton example: shares 49.9%/30.05%/20.05% of 10 seats
    val got = alloc(Seq(("a", 4990L), ("b", 3005L), ("c", 2005L)), 10L)
    assert(got.values.sum == 10L)
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    // equal remainders: the leftover seat goes to the lexicographically
    // first stratum
    val tied = alloc(Seq(("x", 1L), ("y", 1L)), 3L)
    assert(tied == Map("x" -> 2L, "y" -> 1L))
    // budget smaller than stratum count: only largest remainders get 1
    val tiny = alloc(Seq(("a", 7L), ("b", 5L), ("c", 1L)), 2L)
    assert(tiny.values.sum == 2L && tiny("c") == 0L)
    // proportionality at an exact split needs no remainder seats
    val exact = alloc(Seq(("a", 2L), ("b", 6L)), 4L)
    assert(exact == Map("a" -> 1L, "b" -> 3L))
    // beyond-long products stay exact through the decimal path
    val big = alloc(Seq(("a", 3000000000000L), ("b", 1000000000000L)),
      4000000000000L)
    assert(big == Map("a" -> 3000000000000L, "b" -> 1000000000000L))
  }

  test("gopherRules measures each rule and combines the verdict") {
    val clean = ("the quick brown fox jumps over and over with " * 3).trim
    val bullets = "short text\n- one\n- two\n* three\n• four"
    val hashy = "the " + ("#" * 30) + " of and ... ... ..."
    val df = Seq((1L, clean), (2L, bullets), (3L, hashy))
      .toDF("doc_id", "text")
    val got = Curation.gopherRules(df, "doc_id", "text", minWords = 5)
      .orderBy("doc_id").collect()
    // clean: all rules pass
    assert(got(0).getAs[Boolean]("keep"))
    assert(got(0).getAs[Long]("stop_hits") >= 2)
    assert(got(0).getAs[Double]("alpha_frac") == 1.0)
    // bullets: 4 of 5 lines bullet-started -> bullet_frac 0.8, and only
    // 1 stopword -> rejected on stop_hits
    assert(math.abs(got(1).getAs[Double]("bullet_frac") - 0.8) < 1e-9)
    assert(!got(1).getAs[Boolean]("keep"))
    // hashy: symbol ratio way over 0.1 -> rejected
    assert(got(2).getAs[Double]("symbol_ratio") > 0.1)
    assert(!got(2).getAs[Boolean]("keep"))
  }

  test("extractAnchors pairs each href with its tag-stripped inner text") {
    val html = """<a href="https://a.com/1">Plain  text</a>""" +
      """<A CLASS="x" HREF="/rel">nested <b>bold</b> tail</A>""" +
      """<a href="http://b.net/3">multi
        |line</a><a name="no-href">skipped</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(Curation.extractAnchors($"h")).as("a"))
      .select($"a.href", $"a.anchor").as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("https://a.com/1", "Plain text"),
      ("/rel", "nested bold tail"),
      ("http://b.net/3", "multi line")))
    // anchor-free html -> empty array, not null
    assert(Seq("<p>none</p><a name=x>y</a>").toDF("h")
      .select(Curation.extractAnchors($"h")).as[Seq[(String, String)]]
      .head().isEmpty)
  }

  test("lineFilter keeps clean sentences, drops boilerplate/bullets/fragments") {
    val page = Seq(
      "A clean first sentence stands alone here.", //  kept
      "Accept all cookies to continue",            //  boilerplate + no punct
      "* a bullet that still ends with a period.", //  bullet
      "Please click here to subscribe right now.", //  boilerplate
      "Too short.",                                //  < minWords
      "  Indented but otherwise fine sentence here.  ", // kept (trimmed check)
      "").mkString("\n")
    val got = Curation.lineFilter(Seq((1L, page)).toDF("doc_id", "text"),
        "text", 4, Seq("click here", "cookie"))
      .select($"n_lines", $"n_kept", $"clean")
      .as[(Long, Long, String)].head()
    assert(got._1 == 7L)
    assert(got._2 == 2L)
    // surviving lines keep their original (untrimmed) form, joined by \n
    assert(got._3 == "A clean first sentence stands alone here.\n" +
      "  Indented but otherwise fine sentence here.  ")
  }

  test("prefixBlocklist drops disallowed subtrees per host only") {
    val docs = Seq(
      (1L, "https://site-a.org/public/1"),
      (2L, "https://site-a.org/private/2"),   // blocked
      (3L, "https://site-b.org/private/3"),   // /private not blocked on b
      (4L, "https://site-b.org/tmp/cache/4"), // blocked
      (5L, "not a url")                       // no host: kept
    ).toDF("doc_id", "url")
    val rules = Seq(("site-a.org", "/private"), ("site-b.org", "/tmp/"))
      .toDF("host", "prefix")
    val kept = Curation.prefixBlocklist(docs, "doc_id", "url", rules)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 3L, 5L))
  }

  test("bm25TopK ranks term-dense short docs first, deterministic ties") {
    val docs = Seq(
      (1L, "spark spark spark join"),         // dense in both terms
      (2L, "spark a b c d e f g h i j k l m"),// one hit, long doc
      (3L, "join join"),                      // dense in one term
      (4L, "nothing relevant at all here"),   // no hits: excluded
      (5L, "spark spark spark join")          // tie with doc 1 -> doc_id order
    ).toDF("doc_id", "text")
    val got = Curation.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join"), 10)
      .select($"doc_id", $"n_terms", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1).take(2) == Seq(1L, 5L), s"tie order: $got")
    assert(!got.map(_._1).contains(4L))
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "scores descend")
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == byId(5L))
    assert(byId(1L) > byId(2L), "tf saturation still beats single distant hit")
  }

  test("lmBuckets approx mode tracks exact bucket sizes (the 100 TB path)") {
    // two SFs: the sketch threshold is a data value while the exact
    // threshold interpolates, so the only docs that may flip buckets
    // are those AT the boundary order statistic — ±1 doc per bucket
    // edge, at any scale where the sketch is saturated-exact
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = graft.Tables.load(spark, s"/root/testdata/$sf", "documents")
      val exact = Curation.lmBuckets(docs, "doc_id", "text")
        .select($"bucket", $"n_docs").as[(String, Long)].collect().toMap
      val approx = Curation.lmBuckets(docs, "doc_id", "text", exact = false)
        .select($"bucket", $"n_docs").as[(String, Long)].collect().toMap
      assert(exact.keySet == Set("head", "middle", "tail"), s"$sf: $exact")
      assert(exact.values.sum == approx.values.sum, s"$sf: doc totals differ")
      exact.foreach { case (b, n) =>
        assert(math.abs(approx(b) - n) <= 2L, // one flip per bucket edge
          s"$sf bucket $b: approx ${approx(b)} vs exact $n")
      }
    }
  }

  test("weightedSample matches the A-ES model; weight scales inclusion odds") {
    val docs = Seq.tabulate(500)(i => (i.toLong, if (i < 50) 1000L else 10L))
      .toDF("doc_id", "w")
      .unionByName(Seq((999L, 0L), (998L, -5L)).toDF("doc_id", "w"))
    val got = Curation.weightedSample(docs, "doc_id", "w", 40)
      .as[(Long, Long, Double)].collect()
    // model: same arithmetic in plain Scala
    val model = (0 until 500).map { i =>
      val w = if (i < 50) 1000.0 else 10.0
      val u = ((i.toLong * 2654435761L) % 1000003L + 1).toDouble / 1000004.0
      (i.toLong, BigDecimal(math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, k) => (-k, id) }.take(40).map(_._1).toSet
    assert(got.map(_._1).toSet == model)
    // non-positive weights never sampled
    assert(!got.exists(r => r._1 == 999L || r._1 == 998L))
    // the 10% heavy rows (100x weight) dominate the sample
    val heavy = got.count(_._1 < 50)
    assert(heavy > 25, s"expected heavy-weight dominance, got $heavy/40")
  }

  test("phraseSearch counts overlapping exact-adjacency occurrences") {
    val docs = Seq(
      (1L, "the table scan is slow but the table scan works"),
      (2L, "table of scans and a scan table"), // terms present, never adjacent
      (3L, "a a a a"), // overlapping starts: "a a a" twice
      (4L, "")).toDF("doc_id", "text")
    val two = Curation.phraseSearch(docs, "doc_id", "text", Seq("table", "scan"))
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 2L))
    val three = Curation.phraseSearch(docs, "doc_id", "text", Seq("a", "a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(three == Map(3L -> 2L))
  }

  test("secretScan flags planted high-entropy keys, passes natural text") {
    val docs = Seq(
      (1L, "deploy with token sk4Jx9Qw2ZpLm7Rv3TyBh8Nd please"), // random-ish key
      (2L, "the quick brown fox jumps over the lazy dog again"), // short words only
      (3L, "aaaaaaaaaaaaaaaaaaaaaaaa1 padded run"), // long but near-zero entropy
      (4L, "incomprehensibilities notwithstanding deinstitutionalization"), // long words, no digits
      (5L, "")).toDF("doc_id", "text")
    val got = Curation.secretScan(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(got(1L) == ((1L, 1L, true)), s"planted key must flag: ${got(1L)}")
    assert(got(2L) == ((0L, 0L, false)))
    // long repeated run: a candidate, but entropy stays near zero
    assert(got(3L)._1 == 1L && got(3L)._2 == 0L && !got(3L)._3)
    // long natural words: candidates without digit mix never flag
    assert(got(4L)._2 == 0L && !got(4L)._3)
    assert(got(5L) == ((0L, 0L, false)))
    // every input doc gets a row
    assert(got.size == 5)
  }
}
