package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 operators: SQ8 scalar quantization (Similarity.sq8*),
  * per-group quotas, OOV rate, temperature mixture, n-gram novelty. */
class QuantQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def embFrame(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("sq8Encode: codes bounded to [-127,127], zero vector degrades to scale 0") {
    val emb = embFrame(
      0L -> Seq(1.0f, -0.5f, 0.25f, 0.0f),
      1L -> Seq(0.0f, 0.0f, 0.0f, 0.0f),
      2L -> Seq(-2.0f, 2.0f, 1.0f, -1.0f))
    val enc = Similarity.sq8Encode(emb, "vec_id", "embedding")
      .select($"vec_id", $"sq_scale", $"sq_codes")
      .as[(Long, Double, Seq[Int])].collect().sortBy(_._1)
    // max|x| maps to ±127 exactly; half-up ties round toward +inf
    // (-63.5 -> -63); everything stays in the int8 range
    assert(enc(0)._3 == Seq(127, -63, 32, 0))
    assert(enc(0)._2 == 1.0 / 127.0)
    assert(enc(1)._2 == 0.0 && enc(1)._3 == Seq(0, 0, 0, 0))
    assert(enc(2)._3 == Seq(-127, 127, 64, -63))
    assert(enc.forall(_._3.forall(c => c >= -127 && c <= 127)))
  }

  test("sq8Encode: an embedding column literally named 'vec' encodes; rider 'vec' refuses") {
    import org.apache.spark.sql.functions.col
    // embCol == "vec": the output slot IS the input — drop must not fire
    val named = embFrame(0L -> Seq(1.0f, -0.5f), 1L -> Seq(0.5f, 0.5f))
      .withColumnRenamed("embedding", "vec")
    val enc = Similarity.sq8Encode(named, "vec_id", "vec")
    assert(enc.columns.contains("vec") && enc.columns.contains("sq_codes"))
    assert(enc.select(col("sq_codes")).as[Seq[Int]].collect()
      .forall(_.nonEmpty))
    // a RIDER named "vec" beside a differently-named embedding would be
    // silently clobbered — refuse loudly instead
    val rider = embFrame(0L -> Seq(1.0f, -0.5f))
      .withColumn("vec", col("vec_id").cast("string"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.sq8Encode(rider, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("clobbered"))
  }

  test("sq8Error: rmse bounded by half an SQ8 step (the scheme's max per-dim error)") {
    val emb = embFrame(
      0L -> Seq(0.9f, -0.3f, 0.111f, 0.777f),
      1L -> Seq(0.001f, 0.0005f, -0.0002f, 0.0009f))
    val got = Similarity.sq8Error(emb, "vec_id", "embedding")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    got.foreach { case (_, scale, rmse) =>
      assert(rmse >= 0.0 && rmse <= scale / 2.0 + 1e-9,
        s"rmse $rmse exceeds the half-step bound for scale $scale")
    }
  }

  test("sq8TopK ranks like exact cosine on well-separated vectors; corpus never broadcasts") {
    // three tight clusters on distinct axes: quantization cannot
    // reorder across clusters, so the exact top-3 and SQ8 top-3 agree
    def jitter(base: Seq[Float], eps: Float): Seq[Float] =
      base.zipWithIndex.map { case (x, i) => if (i == 3) x + eps else x }
    val a = Seq(1.0f, 0.0f, 0.0f, 0.01f)
    val b = Seq(0.0f, 1.0f, 0.0f, 0.01f)
    val emb = embFrame(
      0L -> a, 1L -> jitter(a, 0.02f), 2L -> jitter(a, 0.04f),
      3L -> b, 4L -> jitter(b, 0.02f), 5L -> jitter(b, 0.04f))
    val approx = Similarity.sq8TopK(emb, "vec_id", "embedding", 0L, 3)
      .select($"vec_id").as[Long].collect().toSet
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 3)
      .select($"vec_id").as[Long].collect().toSet
    assert(approx == exact && exact == Set(1L, 2L, 5L))
    // the only broadcast in the plan is the one-row query frame; top-k
    // is a TakeOrdered, not a global sort
    val plan = Similarity.sq8TopK(emb, "vec_id", "embedding", 0L, 3)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("sq8 null embeddings are unrankable, never surface in top-k") {
    val emb = Seq(
      (0L, Some(Seq(1.0f, 0.0f))), (1L, Some(Seq(0.9f, 0.1f))),
      (2L, None), (3L, Some(Seq(0.8f, 0.2f)))
    ).toDF("vec_id", "embedding")
    val enc = Similarity.sq8Encode(emb, "vec_id", "embedding")
      .filter($"vec_id" === 2L).select($"sq_scale", $"sq_codes").head()
    assert(enc.isNullAt(0) && enc.isNullAt(1)) // null in -> null out
    val top = Similarity.sq8TopK(emb, "vec_id", "embedding", 0L, 3)
      .select($"vec_id").as[Long].collect()
    // unrankable rows are dropped map-side (the knnJoin/pqTopK
    // contract), never padded into the top-k
    assert(top.toSeq == Seq(1L, 3L))
  }

  test("sq8TopKFromCodes serves identically from a persisted codes store") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val direct = Similarity.sq8TopK(emb, "vec_id", "embedding", 0L, 10)
      .as[(Long, Double)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("sq8store").toString
    Similarity.sq8Encode(emb, "vec_id", "embedding")
      .select($"vec_id", $"sq_scale", $"sq_codes")
      .write.mode("overwrite").parquet(dir)
    val served = Similarity
      .sq8TopKFromCodes(spark.read.parquet(dir), "vec_id", 0L, 10)
      .as[(Long, Double)].collect().toSeq
    assert(served == direct && direct.size == 10)
  }

  test("signBucketMultiProbe: nflip=0 == single probe; flips recover cross-bucket neighbors") {
    // query sits at (+,+) with a tiny 2nd component; its true nearest
    // neighbor differs only in that low-margin sign -> single-probe
    // misses it, one flip recovers it
    val emb = embFrame(
      0L -> Seq(1.0f, 0.001f, 0.5f, 0.5f),
      1L -> Seq(1.0f, -0.001f, 0.5f, 0.5f),  // across the low-margin bit
      2L -> Seq(0.9f, 0.2f, 0.5f, 0.5f))     // same bucket as query
    val single = Similarity.signBucketMultiProbe(emb, "vec_id", "embedding",
      0L, bits = 4, nflip = 0, k = 5).select($"vec_id").as[Long].collect().toSet
    val single2 = Similarity.signBucketTopK(emb, "vec_id", "embedding",
      0L, bits = 4, k = 5).select($"vec_id").as[Long].collect().toSet
    assert(single == single2 && single == Set(2L)) // misses vec 1
    val multi = Similarity.signBucketMultiProbe(emb, "vec_id", "embedding",
      0L, bits = 4, nflip = 1, k = 5).select($"vec_id").as[Long].collect().toSet
    assert(multi == Set(1L, 2L)) // the flipped-bit bucket recovers vec 1
  }

  test("standardize centers and scales; dead dimensions map to zero") {
    val emb = embFrame(
      0L -> Seq(10.0f, 5.0f, 1.0f, 0.0f),
      1L -> Seq(12.0f, 5.0f, 2.0f, 0.0f),
      2L -> Seq(14.0f, 5.0f, 3.0f, 0.0f))
    val stats = Similarity.dimStats(emb, "embedding").orderBy($"dim").collect()
    val white = Similarity.standardize(emb, "embedding",
      stats.map(_.getDouble(2)).toSeq, stats.map(_.getDouble(3)).toSeq)
    val ws = Similarity.dimStats(white, "embedding").orderBy($"dim")
      .select($"dim", $"mean", $"std").as[(Int, Double, Double)].collect()
    // live dims land at mean ~0 / std ~1; the constant dim (std 0) and
    // the all-zero dim both become exactly 0
    assert(math.abs(ws(0)._2) < 1e-5 && math.abs(ws(0)._3 - 1.0) < 1e-5)
    assert(ws(1) == ((1, 0.0, 0.0)) && ws(3) == ((3, 0.0, 0.0)))
    assert(math.abs(ws(2)._3 - 1.0) < 1e-5)
  }

  test("rrfFuse: both-list docs beat single-list docs; ranks match row_number") {
    val lex = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("doc_id", "score")
    val dense = Seq((2L, 0.9), (4L, 0.8), (1L, 0.7)).toDF("doc_id", "score")
    val got = Similarity.rrfFuse(Seq(lex, dense), "doc_id", c = 60, k = 4)
      .as[(Long, Double)].collect()
    // doc 2: rank 2 lexical + rank 1 dense; doc 1: rank 1 + rank 3
    val exp = Map(
      1L -> (1.0 / 61 + 1.0 / 63), 2L -> (1.0 / 62 + 1.0 / 61),
      3L -> 1.0 / 63, 4L -> 1.0 / 62)
    got.foreach { case (id, r) =>
      assert(math.abs(r - exp(id)) < 1e-6, s"doc $id: $r vs ${exp(id)}")
    }
    // both-list docs outrank every single-list doc here
    assert(got.take(2).map(_._1).toSet == Set(1L, 2L))
  }

  test("groupQuota keeps exactly min(cap, group size) top rows; ties break to low id") {
    val docs = (
      (1L to 10L).map(i => (i, "big", 100L - i)) ++     // scores 99..90
        Seq((20L, "tie", 5L), (21L, "tie", 5L), (22L, "tie", 5L)) ++
        Seq((30L, "small", 1L))
      ).toDF("doc_id", "grp", "score")
    val out = Curation.groupQuota(docs, "doc_id", "grp", "score", cap = 2)
    assert(out.count() == 14) // flag, don't drop
    val kept = out.filter($"kept").select($"doc_id").as[Long].collect().toSet
    // big: top-2 scores are ids 1,2; tie: equal scores -> ids 20,21; small: all
    assert(kept == Set(1L, 2L, 20L, 21L, 30L))
    // no forced hint on the keep-set join: it is groups-proportional,
    // so strategy is AQE's call (broadcast while small, shuffle at
    // web-scale host counts) — assert the absence of a forced hint
    assert(!out.queryExecution.analyzed.collectFirst {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
        if h.hints.strategy.nonEmpty => h
    }.isDefined)
  }

  test("oovRate scores occurrences outside the top-N vocabulary") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog"),
      (3L, "zyx qwv")).toDF("doc_id", "text")
    // vocabSize 2 -> vocab = {the(3), cat/dog/mat/on/sat tie at 1 -> "cat"}
    val got = Curation.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 6L, 3L, 0.5)))       // sat on mat OOV
    assert(got(1) == ((2L, 2L, 1L, 0.5)))       // dog OOV
    assert(got(2) == ((3L, 2L, 2L, 1.0)))       // fully OOV
  }

  test("temperatureAllocate flattens the size distribution and spends the whole budget") {
    val counts = Seq(("en", 900000L), ("mi", 10000L)).toDF("lang", "n")
    val got = Curation.temperatureAllocate(counts, "lang", "n", 10000L)
      .select($"lang", $"alloc").as[(String, Long)].collect().toMap
    assert(got.values.sum == 10000L)
    // proportional would give mi ~110; sqrt temperature lifts it ~10x
    assert(got("mi") > 900L && got("mi") < 1200L)
    // weights are floor(sqrt(n)*1e6): integer, engine-exact
    val w = Curation.temperatureAllocate(counts, "lang", "n", 10000L)
      .select($"weight").as[Long].collect().toSet
    assert(w == Set(math.floor(math.sqrt(900000.0) * 1e6).toLong,
      math.floor(math.sqrt(10000.0) * 1e6).toLong))
  }

  test("trainLogistic learns a separating model; linearScore serves it") {
    // class 1 says "good", class 0 says "bad"; "filler" is uninformative
    val docs = Seq(
      (1L, "good good filler", 1), (2L, "good filler filler", 1),
      (3L, "bad bad filler", 0), (4L, "bad filler filler", 0)
    ).toDF("doc_id", "text", "y")
    val model = Curation.trainLogistic(docs, "doc_id", "text", "y",
      rounds = 5, lr = 10.0)
    val w = model.as[(String, Double)].collect().toMap
    assert(w("good") > 0 && w("bad") < 0,
      s"indicative tokens must separate: $w")
    assert(math.abs(w("filler")) < w("good"), "filler stays near zero")
    // end-to-end: the trained weights drive the existing inference op
    val scored = Curation.linearScore(docs, "doc_id", "text",
        (w - "__bias__").toSeq, w("__bias__"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scored(1L) > 0.5 && scored(2L) > 0.5 &&
      scored(3L) < 0.5 && scored(4L) < 0.5,
      s"trained model must classify its training set: $scored")
  }

  test("editDistanceGate verifies candidates with normalized Levenshtein") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fix"),   // 1 edit from doc 1
      (3L, "completely different words here")
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.editDistanceGate(docs, "doc_id", "text", cands, 0.3)
      .select($"doc_a", $"doc_b", $"dist", $"dup")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._2)
    assert(got(0) == ((1L, 2L, 1L, true)))   // one substitution
    assert(got(1)._3 > 15 && !got(1)._4)     // far apart, not a dup
    // the prefix cap bounds the per-pair DP
    val capped = Dedup.editDistanceGate(docs, "doc_id", "text", cands, 0.3,
      prefixLen = 9)
    assert(capped.filter($"doc_a" === 1 && $"doc_b" === 2)
      .select($"dist").as[Long].head() == 0L) // identical 9-char prefixes
  }

  test("ngramNovelty: df=1 shingles over the corpus, per-doc fraction") {
    val docs = Seq(
      (1L, "a b c d"),     // shingles: "a b c", "b c d"
      (2L, "a b c x"),     // shingles: "a b c", "b c x"
      (3L, "p q r s")      // shingles: "p q r", "q r s" (all unique)
    ).toDF("doc_id", "text")
    val got = Curation.ngramNovelty(docs, "doc_id", "text", 3)
      .select($"doc_id", $"n_shingles", $"n_unique", $"novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 1L, 0.5)))  // "a b c" shared with doc 2
    assert(got(1) == ((2L, 2L, 1L, 0.5)))
    assert(got(2) == ((3L, 2L, 2L, 1.0)))
  }
}
