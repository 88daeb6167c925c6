package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Model-based checks for the round-7 operators, in the
  * CurationPropertySpec style: on random inputs each Spark operator
  * must match a pure-Scala reference model exactly (same IEEE double
  * ops, same tiebreaks), over seeded trials. */
class QuantPropertySpec extends SparkSpec {
  import spark.implicits._

  test("sq8 round trip matches the scalar model on random vectors") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val dim = 4 + rnd.nextInt(12)
      val vecs = (0L until (20L + rnd.nextInt(30))).map { id =>
        (id, Seq.fill(dim)((rnd.nextFloat() - 0.5f) * 4f))
      }
      // model: identical arithmetic, plain Scala doubles
      val want = vecs.map { case (id, v) =>
        val d = v.map(_.toDouble)
        val s = d.map(math.abs).max / 127.0
        val codes =
          if (s > 0) d.map(x => math.floor(x / s + 0.5).toInt) else d.map(_ => 0)
        (id, s, codes.toList)
      }.toSet
      val got = Similarity.sq8Encode(vecs.toDF("vec_id", "embedding"),
          "vec_id", "embedding")
        .select($"vec_id", $"sq_scale", $"sq_codes")
        .as[(Long, Double, Seq[Int])].collect()
        .map { case (id, s, c) => (id, s, c.toList) }.toSet
      assert(got == want, s"trial $trial (dim=$dim)")
      got.foreach { case (_, _, codes) =>
        assert(codes.forall(c => c >= -127 && c <= 127))
      }
    }
  }

  test("groupQuota matches the sort-take model on random skewed groups") {
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val cap = 1 + rnd.nextInt(4)
      val docs = (0L until (60L + rnd.nextInt(60))).map { id =>
        (id, s"g${rnd.nextInt(4)}", rnd.nextInt(10).toLong)
      }
      val want = docs.groupBy(_._2).flatMap { case (_, rows) =>
        rows.sortBy { case (id, _, sc) => (-sc, id) }.take(cap).map(_._1)
      }.toSet
      val got = Curation.groupQuota(docs.toDF("doc_id", "grp", "score"),
          "doc_id", "grp", "score", cap)
        .filter($"kept").select($"doc_id").as[Long].collect().toSet
      assert(got == want, s"trial $trial (cap=$cap)")
    }
  }

  test("temperatureAllocate matches the largest-remainder model") {
    val rnd = new Random(29)
    for (trial <- 1 to 3) {
      val strata = (0 until (2 + rnd.nextInt(5)))
        .map(i => (s"s$i", 1L + rnd.nextInt(1000000)))
      val budget = 1000L + rnd.nextInt(100000)
      // model: floor(sqrt(n)*1e6) weights, Hamilton seats
      val w = strata.map { case (k, n) =>
        k -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong
      }
      val total = w.map(_._2).sum
      val base = w.map { case (k, wt) => k -> (budget * wt) / total }
      val rem = w.map { case (k, wt) => k -> (budget * wt) % total }.toMap
      val leftover = budget - base.map(_._2).sum
      val order = rem.toSeq.sortBy { case (k, r) => (-r, k) }.map(_._1)
        .zipWithIndex.toMap
      val want = base.map { case (k, b) =>
        k -> (b + (if (order(k) < leftover) 1L else 0L))
      }.toSet
      val got = Curation.temperatureAllocate(strata.toDF("s", "n"),
          "s", "n", budget)
        .select($"s", $"alloc").as[(String, Long)].collect().toSet
      assert(got == want, s"trial $trial (budget=$budget)")
      assert(got.toMap.values.sum == budget)
    }
  }

  test("heavyHitters matches the exact threshold count on random corpora") {
    val vocabAll = ('a' to 'z').map(_.toString)
    val rnd = new Random(41)
    for (trial <- 1 to 3) {
      // skewed: a few hot tokens + a uniform tail
      val hot = vocabAll.take(3)
      val docs = (0L until 40L).map { id =>
        (id, Seq.fill(30)(
          if (rnd.nextInt(10) < 4) hot(rnd.nextInt(hot.size))
          else vocabAll(rnd.nextInt(vocabAll.size))).mkString(" "))
      }
      val toks = docs.flatMap(_._2.split("\\s+"))
      val n = toks.size
      val want = toks.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
        .filter { case (_, c) => 100 * c >= n }.toSet
      val got = Curation.heavyHitters(docs.toDF("doc_id", "text"),
          "doc_id", "text", pctNum = 1, pctDen = 100, sketchK = 120)
        .as[(String, Long)].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("Misra-Gries guarantee: every item above n/(k+1) survives any stream order") {
    val rnd = new Random(43)
    val agg = new graft.functions.MisraGriesAggregator(5)
    for (trial <- 1 to 4) {
      val items = rnd.shuffle(
        Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
          (1 to 40).map(i => s"cold$i"))
      // simulate partial aggregation: arbitrary split points + merge
      val parts = items.grouped(1 + rnd.nextInt(20)).toSeq
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val cands = agg.finish(merged)
      // n=125, k=5 -> anything above 125/6 ~ 21 must survive
      assert(cands.contains("hot") && cands.contains("warm"),
        s"trial $trial lost a guaranteed heavy hitter: $cands")
      assert(merged.size <= 5)
    }
  }

  test("Misra-Gries aggregate runs under streaming complete mode, guarantee intact") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory("mgstream").toString + "/toks"
    val toks = Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 30).map(i => s"cold$i")
    toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tok").write.parquet(dir)
    val stream = spark.readStream
      .schema("id LONG, tok STRING").parquet(dir)
    val q = stream
      .agg(graft.functions.HeavyHitters.mg_candidates(5)($"tok").as("c"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("mg_stream").start()
    try q.processAllAvailable() finally q.stop()
    val cands = spark.table("mg_stream")
      .selectExpr("explode(c) AS tok").as[String].collect().toSet
    // n=100, k=5: anything above 100/6 must survive the streamed fold
    assert(cands.contains("hot") && cands.contains("warm"), cands.toString)
    assert(cands.size <= 5)
  }

  test("oovRate matches the frequency model on random corpora") {
    val vocabAll = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      val topN = 2 + rnd.nextInt(3)
      val docs = (0L until (10L + rnd.nextInt(20))).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(15))(
          vocabAll(rnd.nextInt(vocabAll.size))).mkString(" "))
      }
      val toks = docs.flatMap { case (id, t) => t.split("\\s+").map(id -> _) }
      val freq = toks.groupBy(_._2).map { case (t, v) => t -> v.size }
      val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(topN)
        .map(_._1).toSet
      val want = toks.groupBy(_._1).map { case (id, ts) =>
        val oov = ts.count(p => !vocab(p._2))
        (id, ts.size.toLong, oov.toLong,
          BigDecimal(oov.toDouble / ts.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
      val got = Curation.oovRate(docs.toDF("doc_id", "text"),
          "doc_id", "text", topN)
        .select($"doc_id", $"n_tokens", $"n_oov", $"oov_rate")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == want, s"trial $trial (topN=$topN)")
    }
  }
}
