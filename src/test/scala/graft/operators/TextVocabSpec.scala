package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Contracts of the `_vocab` sidecar and the multi-term expansion
  * serves (wildcard / fuzzy / regexp — the Lucene PrefixQuery family
  * against the postings store):
  *   - buildVocab == a (w, df) recompute over the corpus tokens;
  *   - appends extend it from the batch alone, either layout, and the
  *     extended sidecar still equals the full recompute;
  *   - expansion is deterministic ((df desc, w), distance-first for
  *     fuzzy) and bounded by maxTerms;
  *   - expanded serves == topK over the same driver-held term list ==
  *     the scan-everything ranking;
  *   - batched == the per-query loop, zero-match queries drop whole;
  *   - delete leaves the vocab stale-high WITHOUT moving any served
  *     answer; compaction snaps df back to the survivor-exact value;
  *   - the fold preserves answers and the replay guard; healBatch
  *     re-extends a swallowed batch exactly once.
  */
class TextVocabSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu",
    "alphabet", "align", "alias")

  private lazy val docs = {
    val rnd = new Random(23)
    (0L until 80L).map { i =>
      val n = 5 + rnd.nextInt(8)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_vocab_$tag")
    d.toFile.deleteOnExit()
    d.resolve("store").toString
  }

  private def vocabRows(dir: String): Seq[(String, Long)] =
    TextIndex.vocabulary(spark, dir)
      .orderBy($"w").as[(String, Long)].collect().toSeq

  /** Exact (w, df) recompute with the store's own tokenizer. */
  private def recompute(d: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    d.select($"doc_id", explode(split($"text", "\\s+")).as("w"))
      .distinct().groupBy($"w").agg(count(lit(1)).as("df"))
      .orderBy($"w").as[(String, Long)].collect().toSeq

  private def served(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"n_terms", $"score")
      .as[(Long, Long, Double)].collect().toSeq

  test("buildVocab == corpus (w, df) recompute; appends extend exactly") {
    val dir = tmp("extend")
    TextIndex.build(docs.filter($"doc_id" < 50), "doc_id", "text", dir,
      nBuckets = 4, filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    assert(vocabRows(dir) == recompute(docs.filter($"doc_id" < 50)))
    TextIndex.append(docs.filter($"doc_id" >= 50), "doc_id", "text", dir,
      filesPerBucket = 2)
    assert(vocabRows(dir) == recompute(docs),
      "the batch-only extension must land the union's exact df")
  }

  test("positional appends extend the vocab too (layout-independent)") {
    val dir = tmp("pos")
    TextIndex.buildPositional(docs.filter($"doc_id" < 50), "doc_id",
      "text", dir, nBuckets = 4, filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    TextIndex.appendPositional(docs.filter($"doc_id" >= 50), "doc_id",
      "text", dir, filesPerBucket = 2)
    assert(vocabRows(dir) == recompute(docs))
  }

  test("expansion is deterministic, bounded, and df-ranked") {
    val dir = tmp("expand")
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4)
    TextIndex.buildVocab(spark, dir)
    val all = TextIndex.vocabulary(spark, dir)
      .as[(String, Long)].collect().toMap
    val exp = TextIndex.expandPrefix(spark, dir, "al", maxTerms = 2)
    val want = all.keys.filter(_.startsWith("al")).toSeq
      .sortBy(w => (-all(w), w)).take(2)
    assert(exp == want)
    // full prefix expansion covers every matching term
    assert(TextIndex.expandPrefix(spark, dir, "al").toSet ==
      all.keys.filter(_.startsWith("al")).toSet)
    assert(TextIndex.expandPrefix(spark, dir, "zzz").isEmpty)
    intercept[IllegalArgumentException] {
      TextIndex.expandPrefix(spark, dir, "")
    }
    // fuzzy: distance-first, then df; plain Levenshtein semantics
    val fz = TextIndex.expandFuzzy(spark, dir, "alphx", maxDist = 2)
    assert(fz.head == "alpha", s"alpha is 1 edit from alphx, got $fz")
    assert(fz.forall(w => all.contains(w)))
    assert(TextIndex.expandFuzzy(spark, dir, "beta", maxDist = 0) ==
      Seq("beta"))
    // regexp: anchored pattern, df-ranked
    val rx = TextIndex.expandRegexp(spark, dir, "^al.+a$")
    assert(rx.toSet == all.keys.filter(w =>
      w.startsWith("al") && w.endsWith("a") && w.length > 3).toSet)
    // suffix (leading wildcard *a): reversed-column expansion, same
    // (df desc, w) ranking discipline as the prefix form
    val sx = TextIndex.expandSuffix(spark, dir, "a", maxTerms = 3)
    val wantSx = all.keys.filter(_.endsWith("a")).toSeq
      .sortBy(w => (-all(w), w)).take(3)
    assert(sx == wantSx, s"suffix expansion must rank (df desc, w): $sx")
    assert(TextIndex.expandSuffix(spark, dir, "a").toSet ==
      all.keys.filter(_.endsWith("a")).toSet)
    assert(TextIndex.expandSuffix(spark, dir, "qzz").isEmpty)
    intercept[IllegalArgumentException] {
      TextIndex.expandSuffix(spark, dir, "")
    }
    // pre-rw vocab files (the sidecar format before the reversed
    // column): expansion degrades to on-the-fly reverse, same answer
    val keep = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/_vocab")
      .select($"bid", $"w", $"df").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    graft.sinks.HadoopSwap.deleteRecursive(spark, s"$dir/_vocab")
    keep.toSeq.toDF("bid", "w", "df")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_vocab")
    assert(TextIndex.expandSuffix(spark, dir, "a").toSet ==
      all.keys.filter(_.endsWith("a")).toSet,
      "a pre-rw vocab must still answer suffix expansion exactly")
  }

  test("expanded serves == topK over the expansion == scan ranking") {
    val dir = tmp("serve")
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4,
      filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    val exp = TextIndex.expandPrefix(spark, dir, "al", maxTerms = 3)
    assert(served(TextIndex.wildcardTopK(spark, dir, "al", 10,
        maxTerms = 3)) ==
      served(TextIndex.topK(spark, dir, exp, 10)))
    assert(served(TextIndex.wildcardTopK(spark, dir, "al", 10,
        maxTerms = 3)) ==
      served(Curation.bm25TopK(docs, "doc_id", "text", exp, 10)))
    val fexp = TextIndex.expandFuzzy(spark, dir, "thetz", maxDist = 1)
    assert(served(TextIndex.fuzzyTopK(spark, dir, "thetz", 1, 10)) ==
      served(TextIndex.topK(spark, dir, fexp, 10)))
    assert(served(TextIndex.regexpTopK(spark, dir, "^zzznope$", 10)).isEmpty)
  }

  test("batched wildcard == the per-query loop; dead queries drop") {
    val dir = tmp("batch")
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4,
      filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    val queries = Seq((0L, "al"), (1L, "the"), (2L, "zzznope"))
      .toDF("query_id", "prefix")
    val got = TextIndex.wildcardTopKBatch(spark, dir, queries,
        "query_id", "prefix", 5, maxTerms = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = Seq(0L -> "al", 1L -> "the").flatMap { case (qid, p) =>
      served(TextIndex.wildcardTopK(spark, dir, p, 5, maxTerms = 2))
        .map { case (d, nt, sc) => (qid, d, nt, sc) }
    }
    assert(got == want)
    assert(!got.exists(_._1 == 2L), "a zero-match query must drop whole")
    intercept[IllegalArgumentException] {
      TextIndex.wildcardTopKBatch(spark, dir,
        Seq((0L, "")).toDF("query_id", "prefix"), "query_id", "prefix", 5)
    }
  }

  test("batched fuzzy and regexp == their per-query loops") {
    val dir = tmp("frbatch")
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4,
      filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    val fq = Seq((0L, "alphx", 2), (1L, "thetz", 1), (2L, "qqzz", 1))
      .toDF("query_id", "term", "maxd")
    val fgot = TextIndex.fuzzyTopKBatch(spark, dir, fq, "query_id",
        "term", "maxd", 5, maxTerms = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val fwant = Seq((0L, "alphx", 2), (1L, "thetz", 1)).flatMap {
      case (qid, t, d) =>
        served(TextIndex.fuzzyTopK(spark, dir, t, d, 5, maxTerms = 3))
          .map { case (doc, nt, sc) => (qid, doc, nt, sc) }
    }
    assert(fgot == fwant)
    assert(!fgot.exists(_._1 == 2L))
    val rq = Seq((0L, "^al.+a$"), (1L, "^.eta$"), (2L, "^qqzz"))
      .toDF("query_id", "pat")
    val rgot = TextIndex.regexpTopKBatch(spark, dir, rq, "query_id",
        "pat", 5, maxTerms = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val rwant = Seq((0L, "^al.+a$"), (1L, "^.eta$")).flatMap {
      case (qid, p) =>
        served(TextIndex.regexpTopK(spark, dir, p, 5, maxTerms = 3))
          .map { case (doc, nt, sc) => (qid, doc, nt, sc) }
    }
    assert(rgot == rwant)
    assert(!rgot.exists(_._1 == 2L))
    intercept[IllegalArgumentException] {
      TextIndex.fuzzyTopKBatch(spark, dir,
        Seq((0L, "x", -1)).toDF("query_id", "term", "maxd"),
        "query_id", "term", "maxd", 5)
    }
  }

  test("multi-phrase == window recompute; wildcard slots expand; " +
      "degenerate forms match phraseSearch") {
    val dir = tmp("mphrase")
    TextIndex.buildPositional(docs, "doc_id", "text", dir, nBuckets = 4,
      filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    def brute(slots: Seq[Set[String]]): Seq[(Long, Long)] =
      docs.as[(Long, String)].collect().toSeq.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val n = (0 to toks.length - slots.length).count(p =>
          slots.indices.forall(i => slots(i).contains(toks(p + i))))
        if (n > 0) Some((id, n.toLong)) else None
      }.sortBy(_._1)
    def got(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    val slots = Seq(Set("alpha", "alias", "alphabet"), Set("beta", "mu"))
    assert(got(TextIndex.phraseSearchMulti(spark, dir,
      slots.map(_.toSeq))) == brute(slots))
    assert(brute(slots).nonEmpty, "test setup: the phrase must occur")
    // single-alternative slots degenerate to the plain phrase serve
    assert(got(TextIndex.phraseSearchMulti(spark, dir,
        Seq(Seq("alpha"), Seq("beta")))) ==
      got(TextIndex.phraseSearch(spark, dir, Seq("alpha", "beta"))))
    // wildcard slot == the same slots via expandPrefix
    val alSet = TextIndex.expandPrefix(spark, dir, "al").toSet
    assert(got(TextIndex.phraseSearchWildcard(spark, dir,
        Seq("al*", "beta"))) ==
      brute(Seq(alSet, Set("beta"))))
    // dead alternatives drop; an all-dead slot answers empty
    assert(got(TextIndex.phraseSearchMulti(spark, dir,
        Seq(Seq("alpha", "qqzznope"), Seq("beta")))) ==
      got(TextIndex.phraseSearch(spark, dir, Seq("alpha", "beta"))))
    assert(got(TextIndex.phraseSearchMulti(spark, dir,
      Seq(Seq("qqzznope"), Seq("beta")))).isEmpty)
    assert(got(TextIndex.phraseSearchWildcard(spark, dir,
      Seq("qqzznope*", "beta"))).isEmpty)
    intercept[IllegalArgumentException] {
      TextIndex.phraseSearchWildcard(spark, dir, Seq("*", "beta"))
    }
  }

  test("batched multi-phrase / wildcard-phrase == their per-query " +
      "loops; dead and unfillable queries drop whole") {
    val dir = tmp("mpbatch")
    TextIndex.buildPositional(docs, "doc_id", "text", dir, nBuckets = 4,
      filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    def got(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select($"query_id", $"doc_id", $"n_occurrences")
        .as[(Long, Long, Long)].collect().toSeq
    def single(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    // multi-phrase batch: mixed shapes, one with a dead alternative
    // (drops the alternative, not the query), one fully dead slot
    // (drops the query whole)
    val mqs = Seq(
      (0L, Seq(Seq("alpha", "alias", "alphabet"), Seq("beta", "mu"))),
      (1L, Seq(Seq("alpha"), Seq("beta"))),
      (2L, Seq(Seq("alpha", "qqzznope"), Seq("beta"))),
      (3L, Seq(Seq("qqzzdead"), Seq("beta"))))
      .toDF("query_id", "slots")
    val batched = got(TextIndex.phraseSearchMultiBatch(spark, dir, mqs,
      "query_id", "slots"))
    val loop = Seq(
      0L -> Seq(Seq("alpha", "alias", "alphabet"), Seq("beta", "mu")),
      1L -> Seq(Seq("alpha"), Seq("beta")),
      2L -> Seq(Seq("alpha", "qqzznope"), Seq("beta")),
      3L -> Seq(Seq("qqzzdead"), Seq("beta"))
    ).flatMap { case (q, slots) =>
      single(TextIndex.phraseSearchMulti(spark, dir, slots))
        .map(r => (q, r._1, r._2))
    }
    assert(batched == loop, "batched multi-phrase must equal the loop")
    assert(!batched.exists(_._1 == 3L), "all-dead slot drops the query")
    assert(batched.exists(_._1 == 0L), "test setup: matches must exist")
    // wildcard batch: pattern + literal slots, one unfillable pattern
    val wqs = Seq(
      (0L, Seq("al*", "beta")), (1L, Seq("table", "s*")),
      (2L, Seq("qqzznope*", "beta")))
      .toDF("query_id", "slots")
    val wb = got(TextIndex.phraseSearchWildcardBatch(spark, dir, wqs,
      "query_id", "slots", maxTerms = 8))
    val wloop = Seq(0L -> Seq("al*", "beta"), 1L -> Seq("table", "s*"),
      2L -> Seq("qqzznope*", "beta")
    ).flatMap { case (q, slots) =>
      single(TextIndex.phraseSearchWildcard(spark, dir, slots,
        maxTerms = 8)).map(r => (q, r._1, r._2))
    }
    assert(wb == wloop, "batched wildcard phrase must equal the loop")
    assert(!wb.exists(_._1 == 2L), "unfillable pattern drops the query")
    intercept[IllegalArgumentException] {
      TextIndex.phraseSearchWildcardBatch(spark, dir,
        Seq((0L, Seq("*", "beta"))).toDF("query_id", "slots"),
        "query_id", "slots")
    }
    // a slot of [null] must refuse loudly like the single serve's
    // per-slot require — not silently answer empty
    intercept[IllegalArgumentException] {
      TextIndex.phraseSearchMultiBatch(spark, dir,
        Seq((0L, Seq(Seq[String](null), Seq("beta"))))
          .toDF("query_id", "slots"),
        "query_id", "slots")
    }
  }

  test("delete leaves vocab stale-high without moving served answers; " +
      "compact snaps df exact") {
    val dir = tmp("del")
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4,
      filesPerBucket = 2)
    TextIndex.buildVocab(spark, dir)
    val before = vocabRows(dir)
    val survivors = docs.filter($"doc_id" % 4 =!= 0)
    assert(TextIndex.delete(spark, dir,
      docs.filter($"doc_id" % 4 === 0).select($"doc_id"), "doc_id") > 0L)
    // stale-high by contract: the sidecar still counts tombstoned docs
    assert(vocabRows(dir) == before)
    // ...but every served answer is already survivor-exact
    val exp = TextIndex.expandPrefix(spark, dir, "al", maxTerms = 3)
    assert(served(TextIndex.wildcardTopK(spark, dir, "al", 10,
        maxTerms = 3)) ==
      served(Curation.bm25TopK(survivors, "doc_id", "text", exp, 10)))
    TextIndex.compact(spark, dir, filesPerBucket = 2)
    assert(vocabRows(dir) == recompute(survivors),
      "compaction must rebuild the vocab survivor-exact")
  }

  test("fold preserves answers and the replay guard; healBatch " +
      "re-extends a swallowed batch exactly once") {
    val dir = tmp("heal")
    val d0 = docs.filter($"doc_id" < 60)
    val d1 = docs.filter($"doc_id" >= 60)
    TextIndex.build(d0, "doc_id", "text", dir, nBuckets = 4,
      marker = Some(0L))
    TextIndex.buildVocab(spark, dir)
    // streaming crash window: batch 1's DATA landed (healBatch never
    // inspects data files) but every post-write sidecar step was lost
    TextIndex.healBatch(d1, "doc_id", "text", dir, batchId = 1L,
      nBuckets = 4)
    assert(vocabRows(dir) == recompute(docs),
      "the heal must re-extend the swallowed batch's vocab rows")
    // redelivery: the replay guard must add nothing
    TextIndex.healBatch(d1, "doc_id", "text", dir, batchId = 1L,
      nBuckets = 4)
    assert(vocabRows(dir) == recompute(docs))
    // fold through the maintenance rewrite: same rows to every reader,
    // bid carries the high-water mark so the guard still answers
    val side = s"$dir/_vocab"
    assert(graft.sinks.SidecarFold.foldIfDecayed(spark, side, 1)(
      _.groupBy(col("w")).agg(max(col("bid")).as("bid"),
          sum(col("df")).as("df"))
        .select(col("bid"), col("w"), col("df"))))
    assert(vocabRows(dir) == recompute(docs))
    TextIndex.healBatch(d1, "doc_id", "text", dir, batchId = 1L,
      nBuckets = 4)
    assert(vocabRows(dir) == recompute(docs),
      "a replay after the fold must still see batch 1 as applied")
  }

  test("the empty-string stats artifact never becomes a term: excluded " +
      "from vocabulary() and every expansion, postings keep it") {
    val dir = tmp("empty")
    // leading / double / trailing whitespace → "" tokens in the
    // postings (the bag-stats contract) — but Lucene never surfaces
    // an empty query term, so the dictionary must not either
    val messy = Seq(
      (0L, " alpha  beta"), (1L, "beta gamma "), (2L, "a  ab alpha"))
      .toDF("doc_id", "text")
    TextIndex.build(messy, "doc_id", "text", dir, nBuckets = 4)
    TextIndex.buildVocab(spark, dir)
    // the contract split: postings carry "", the dictionary does not
    assert(spark.read.parquet(dir).filter($"w" === "").count() > 0,
      "fixture: the store must hold empty-token postings")
    val vocab = vocabRows(dir).map(_._1)
    assert(!vocab.contains(""), s"vocabulary must drop the artifact: $vocab")
    assert(vocab.contains("a") && vocab.contains("alpha"))
    // fuzzy's length band reaches 0 for a 1-char term at maxDist 1 —
    // the artifact must not burn an expansion slot
    assert(!TextIndex.expandFuzzy(spark, dir, "a", maxDist = 1,
      maxTerms = 16).contains(""))
    // a regexp that matches "" must not surface it either
    assert(!TextIndex.expandRegexp(spark, dir, "^a*$").contains(""))
  }
}
