package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Model-based checks for the round-4 curation operators: on random
  * corpora, each Spark operator must match a pure-Scala reference
  * model exactly — the same style as ClosurePropertySpec (seeded
  * trials, one Spark job each, not ScalaCheck's hundreds).
  *
  * The mixture model intentionally re-implements the md5-threshold
  * arithmetic in plain Scala: both engines (and this model) perform
  * the identical IEEE double ops, so agreement is exact, which is the
  * whole reproducibility claim of the operator.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val vocab = Vector("the", "a", "cat", "dog", "runs", "fast", "slow", "x9")

  private def randomDoc(rnd: Random, n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("segmentDedup matches the first-occurrence model on random corpora") {
    val rnd = new Random(11)
    for (trial <- 1 to 4) {
      val w = 2 + rnd.nextInt(4)
      val docs = (0L until (5L + rnd.nextInt(10))).map { id =>
        (id, randomDoc(rnd, 1 + rnd.nextInt(20)))
      }
      // model: windows in (doc_id, idx) order; first content occurrence kept
      val seen = scala.collection.mutable.Set.empty[String]
      val want = docs.flatMap { case (id, text) =>
        text.split("\\s+").grouped(w).zipWithIndex.map { case (seg, i) =>
          val content = seg.mkString(" ")
          val dup = !seen.add(content)
          (id, i.toLong, dup)
        }
      }.toSet
      val got = Dedup.segmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text", w)
        .select($"doc_id", $"seg_idx", $"dup")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got == want, s"trial $trial (w=$w)")
    }
  }

  test("resampleToMixture matches the threshold model on random strata") {
    val rnd = new Random(23)
    for (trial <- 1 to 3) {
      val strata = Seq("s0", "s1", "s2").take(2 + rnd.nextInt(2))
      val docs = (0L until (100L + rnd.nextInt(200))).map { id =>
        (id, strata(rnd.nextInt(strata.size)))
      }
      val weights = strata.map(_ -> (0.1 + rnd.nextDouble() * 0.9)).toMap
      // model: identical arithmetic, plain Scala
      val counts = docs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val nstar = strata.map(s => counts(s).toDouble / weights(s)).min
      def keep(id: Long, s: String): Boolean = {
        val rate = weights(s) * nstar / counts(s).toDouble
        rate >= 1.0 || {
          val thr = math.floor(rate * 4294967296.0).toLong
          val hex = ("0" * 8 + java.lang.Long.toHexString(thr)).takeRight(8)
          md5hex(id.toString).substring(0, 8) < hex
        }
      }
      val want = docs.filter { case (id, s) => keep(id, s) }.map(_._1).toSet
      val got = Curation.resampleToMixture(
          docs.toDF("doc_id", "lang"), "lang", "doc_id", weights)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == want, s"trial $trial (${strata.size} strata)")
    }
  }

  test("scrub matches java replaceAll on PII-injected random text") {
    val rnd = new Random(37)
    val pii = Seq("bob@ex.com", "10.0.0.255", "555-123-9876")
    val docs = (0L until 30L).map { id =>
      val words = Seq.fill(6)(vocab(rnd.nextInt(vocab.size))) ++
        (if (rnd.nextBoolean()) Seq(pii(rnd.nextInt(pii.size))) else Nil)
      (id, rnd.shuffle(words).mkString(" "))
    }
    val want = docs.map { case (id, text) =>
      val stripped = Curation.piiPatterns.foldLeft(text)((t, p) => t.replaceAll(p, " "))
      id -> stripped.replaceAll("\\s+", " ").trim
    }.toMap
    val got = Curation.scrub(docs.toDF("doc_id", "text"), "text", Curation.piiPatterns)
      .select($"doc_id", $"clean").as[(Long, String)].collect().toMap
    assert(got == want)
    assert(got.values.forall(v => !v.contains("@")))
  }

  test("chunk with stride == window reassembles to the original tokens") {
    val rnd = new Random(53)
    val docs = (0L until 20L).map(id => (id, randomDoc(rnd, 1 + rnd.nextInt(40))))
    val got = Curation.chunk(docs.toDF("doc_id", "text"), "doc_id", "text", 7, 7)
      .select($"doc_id", $"chunk_idx", $"chunk")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).mkString(" ")
      }
    docs.foreach { case (id, text) => assert(got(id) == text, s"doc $id") }
  }

  test("duplicateSpans matches the sliding-window model on random corpora") {
    val rnd = new Random(43)
    for (trial <- 1 to 3) {
      val n = 2 + rnd.nextInt(3) // span width
      // random docs, then inject one shared run into two of them at
      // random offsets — the cross-doc signal the operator must find
      val base = (0L until (6L + rnd.nextInt(6))).map { id =>
        id -> randomDoc(rnd, n + rnd.nextInt(15))
      }
      val run = Seq.fill(n + 2)("zz" + rnd.nextInt(3)).mkString(" ")
      val docs = base.map { case (id, t) =>
        if (id <= 1) (id, s"$t $run") else (id, t)
      }
      // model: per-doc token windows; a span hash is duplicated when it
      // occurs in >= 2 distinct docs; coverage = distinct positions
      val spansOf = docs.map { case (id, t) =>
        val toks = t.split("\\s+")
        id -> toks.indices.dropRight(n - 1)
          .map(i => (i + 1, toks.slice(i, i + n).mkString(" ")))
      }.toMap
      val docsPerSpan = spansOf.toSeq
        .flatMap { case (id, sp) => sp.map { case (_, s) => (s, id) } }
        .distinct.groupBy(_._1).view.mapValues(_.size).toMap
      val want = docs.collect {
        case (id, t) if t.split("\\s+").length >= n =>
          val dups = spansOf(id).filter { case (_, s) => docsPerSpan(s) >= 2 }
          val cover = dups.flatMap { case (p, _) => p until (p + n) }.distinct
          id -> (dups.size.toLong, cover.size.toLong)
      }.toMap
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .select($"doc_id", $"n_dup_spans", $"n_dup_tokens")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == want, s"trial $trial (n=$n)")
      assert(got(0L)._1 >= 1 && got(1L)._1 >= 1, "injected run not found")
    }
  }

  test("shardAssign matches the md5 hex-pair model for random shard counts") {
    val rnd = new Random(71)
    for (trial <- 1 to 3) {
      val n = 1 + rnd.nextInt(256)
      val ids = (0L until 300L).toDF("doc_id")
      val want = (0L until 300L).map { id =>
        val h = md5hex(id.toString)
        val v = "0123456789abcdef".indexOf(h.charAt(0)) * 16 +
          "0123456789abcdef".indexOf(h.charAt(1))
        id -> (v % n)
      }.toMap
      val got = Curation.shardAssign(ids, "doc_id", n)
        .select($"doc_id", $"shard".cast("int")).as[(Long, Int)].collect().toMap
      assert(got == want, s"trial $trial (n=$n)")
      assert(got.values.forall(s => s >= 0 && s < n))
    }
  }

  test("charEntropy matches the plain-Scala model exactly on random corpora") {
    val rnd = new Random(29)
    for (_ <- 1 to 3) {
      val docs = (0L until (4L + rnd.nextInt(6))).map { id =>
        (id, randomDoc(rnd, 1 + rnd.nextInt(15)))
      }
      // model: identical arithmetic — per-char p, round6(-p*ln(p)/ln(2))
      // summed exactly (BigDecimal), rounded to 6
      def round6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = docs.map { case (id, text) =>
        val counts = text.toSeq.groupBy(identity).map { case (_, g) => g.size }
        val n = text.length.toLong
        val h = counts.map { c =>
          BigDecimal(round6(-(c.toDouble / n) * math.log(c.toDouble / n) / math.log(2.0)))
        }.sum.toDouble
        id -> ((n, round6(h)))
      }.toMap
      val got = Curation.charEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want)
      // entropy bounds: 0 <= H <= log2(#distinct chars) (+rounding slack)
      got.foreach { case (id, (_, h)) =>
        val k = docs.toMap.apply(id).toSeq.distinct.size
        assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-4, s"doc $id H=$h k=$k")
      }
    }
  }

  test("readability counts are consistent: syllables inside chars, words positive") {
    val rnd = new Random(31)
    val docs = (0L until 20L).map(id => (id, randomDoc(rnd, 1 + rnd.nextInt(30)) +
      (if (id % 3 == 0) ". The end! Sure?" else ""))).toDF("doc_id", "text")
    val rows = Curation.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 20)
    rows.foreach { case (id, w, s2, syl, fk) =>
      assert(w > 0 && s2 >= 1 && syl >= 0, s"doc $id")
      // each syllable is at least one char; each word at most its chars
      assert(fk == BigDecimal(0.39 * w.toDouble / s2 + 11.8 * syl.toDouble / w - 15.59)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"doc $id fk")
    }
  }
}
