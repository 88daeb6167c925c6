package graft.tools

import graft.GraftSession
import graft.operators.TextIndex
import org.apache.spark.sql.functions._

/** Serve-side wall-clock attribution for the round-13 adjudication
  * residuals ([[IngestProfile]]'s discipline applied to the two
  * close-bench rows the r13 judge flagged with "plausible but
  * unpriced" causes):
  *
  *   - q236_phrase_batch +17%: the distinct-covered-slots correctness
  *     gate (countDistinct where a row count was). Arms A/B run the
  *     SAME batched phrase serve with the gate on and off (the
  *     row-count arm is answer-identical on this churn-free store) —
  *     the floor delta IS the gate's price.
  *   - q237_near_search +15%: hypothesis "the unified layout's
  *     ''-tail postings inflate the '' term's bucket that every span
  *     serve's scan shares". The tool counts the store's actual ''
  *     postings first: on whitespace-clean corpora (every driver SF)
  *     the count is ZERO — no '' posting rows exist, so no bucket is
  *     inflated and the hypothesis is structurally impossible; the
  *     near-search floor is printed for the record.
  *
  * usage: runMain graft.tools.ServeProfile <sfDir> [repeat]
  */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeat = args.lift(1).flatMap(_.toIntOption).getOrElse(5)
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(32))
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft_srvprof")
      d.toFile.deleteOnExit()
      d.resolve("store").toString
    }
    TextIndex.buildPositional(docs, "doc_id", "text", dir, nBuckets = 8,
      filesPerBucket = 2)

    val emptyPostings = spark.read.parquet(dir)
      .filter(col("w") === "").count()
    println(s"'' postings in the unified store: $emptyPostings " +
      (if (emptyPostings == 0L)
        "(zero — the ''-bucket-inflation hypothesis for q237 is " +
          "structurally impossible on this corpus)"
      else "(non-zero — '' shares its bucket's files with real terms)"))

    def floor(name: String)(body: () => Long): Unit = {
      val times = (1 to repeat).map { _ =>
        val t0 = java.lang.System.nanoTime()
        val n = body()
        ((java.lang.System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"== $name%-44s min of $repeat = $best%6.3f s " +
        f"(${times.head._2} rows)")
    }

    // q237's shape: positional NEAR over the unified store
    floor("near_search join~merge/3 (q237 shape)")(() =>
      TextIndex.nearSearch(spark, dir, "join", "merge", 3).count())

    // q236's shape: batched exact phrase, gate on vs off
    val queries = Seq(
      (0L, Seq("join", "merge")), (1L, Seq("vector", "stream")),
      (2L, Seq("filter", "sort")), (3L, Seq("small", "batch")))
      .toDF("query_id", "phrase")
    floor("phrase_batch distinct-slot gate ON (q236)")(() =>
      TextIndex.phraseSearchBatch(spark, dir, queries,
        "query_id", "phrase").count())
    // package-private in-process hook — deliberately NOT an env var
    // (a stray variable must never change production answers on
    // churned stores; only this profiler flips it, around its own A/B)
    TextIndex.serveRowCountGate = true
    try
      floor("phrase_batch row-count gate OFF (A/B)")(() =>
        TextIndex.phraseSearchBatch(spark, dir, queries,
          "query_id", "phrase").count())
    finally TextIndex.serveRowCountGate = false

    // round-15 arm: the BM25F pruned serve's price vs the unpruned
    // one, on the q278 banded fixture (dense rewrite so θ dominates
    // and the sparse bands actually skip) — the measured side of the
    // SCALE.md claim that pruning shrinks the WIDE pass while the
    // cheap (doc_id, w) df pass is unavoidable for field exactness
    val dense = Seq.fill(50)("join merge").mkString(" ")
    val fdocs0 = docs.withColumn("text",
      when(col("doc_id") % 11 === 0, lit(dense)).otherwise(col("text")))
    val toks = split(col("text"), "\\s+")
    val fielded = fdocs0.select(col("doc_id"), size(toks).as("dl"),
      array_join(slice(toks, lit(1), lit(3)), " ").as("title"),
      array_join(slice(toks, lit(4), greatest(size(toks) - 3, lit(0))),
        " ").as("body"))
    val dT = dir + "_ft"
    val dB = dir + "_fb"
    val bandA = col("doc_id") % 11 === 0
    val bandB = col("doc_id") % 11 =!= 0 && col("dl") >= 50
    Seq(("title", dT), ("body", dB)).foreach { case (c, out) =>
      TextIndex.build(fielded.filter(bandA), "doc_id", c, out,
        nBuckets = 8, filesPerBucket = 2)
      TextIndex.buildBlockStats(spark, out)
      TextIndex.append(fielded.filter(bandB), "doc_id", c, out,
        filesPerBucket = 2)
      TextIndex.append(fielded.filter(!bandA && !bandB), "doc_id", c,
        out, filesPerBucket = 2)
    }
    val fields = Seq(("title", dT, 2.0, 0.5), ("body", dB, 1.0, 0.75))
    floor("bm25f unpruned (q278 fixture)")(() =>
      TextIndex.bm25fTopK(spark, fields, Seq("join", "merge"), 10)
        .count())
    floor("bm25f block-max pruned (A/B)")(() => {
      val n = TextIndex.bm25fTopKPruned(spark, fields,
        Seq("join", "merge"), 10).count()
      val st = TextIndex.lastPruneStats.get
      require(!st.delegated && st.skipped > 0, s"fixture must skip: $st")
      n
    })
    spark.stop()
  }
}
