package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc A/B profiling main for the text-store ingest path (not a
  * test — run with `Test/runMain graft.tools.TextBuildProfile`).
  * Replays the r10 3-pass sidecar derivation inline against the
  * single-pass `TextIndex.build` in ONE JVM, alternating, so codegen
  * warm-up and box contention hit both arms equally. */
object TextBuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.silenceSidecarListingNoise()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $tag $s%.2f s"); s
    }

    def tmp(i: Int, arm: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_prof_${arm}_$i").resolve("store").toString

    // the r10 shape: postings write, then TWO more corpus tokenize
    // passes (doclen + stats) and a written-w bitset read
    def oldBuild(out: String): Unit = {
      val nBuckets = 8; val filesPerBucket = 2
      val post = docs.select(col("doc_id"),
          split(col("text"), "\\s+").as("toks"))
        .withColumn("dl", size(col("toks")).cast("long"))
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
        .groupBy(col("doc_id"), col("dl"), col("w"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("tb", pmod(xxhash64(col("w")), lit(nBuckets)).cast("int"))
      post.repartitionByRange(nBuckets * filesPerBucket, col("tb"), col("w"))
        .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
        .write.partitionBy("tb").mode("overwrite").parquet(out)
      graft.sinks.SkippingStore.indexPartitioned(spark, out, Seq("w"))
      docs.select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("dl"))
        .write.mode("append").parquet(s"$out/_doclen")
      val r = docs
        .select(size(split(col("text"), "\\s+")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).head()
      // bitset replica: distinct w of the written store, 4 probes
      spark.read.parquet(out).select(col("w")).distinct()
        .select(explode(array((0 until 4).map(i =>
          pmod(xxhash64(col("w"), lit(i)), lit((1 << 17).toLong))): _*))
          .as("p"))
        .groupBy((col("p") / 64).cast("int").as("word"))
        .agg(expr("bit_or(shiftleft(1L, cast(p % 64 AS int)))").as("bits"))
        .collect()
      import spark.implicits._
      Seq((-1L, r.getLong(0), r.getLong(1), nBuckets))
        .toDF("bid", "n", "sdl", "nbuckets")
        .coalesce(1).write.mode("append").parquet(s"$out/_corpus_stats")
    }

    // the single-pass shape, inline, with per-phase timers
    def newBuild(out: String, i: Int): Unit = {
      val nBuckets = 8; val filesPerBucket = 2
      val obs = org.apache.spark.sql.Observation()
      val post = docs.select(col("doc_id"),
          split(col("text"), "\\s+").as("toks"))
        .withColumn("dl", size(col("toks")).cast("long"))
        .observe(obs, count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
        .groupBy(col("doc_id"), col("dl"), col("w"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("tb", pmod(xxhash64(col("w")), lit(nBuckets)).cast("int"))
      time(s"  n$i-write") {
        post.repartitionByRange(nBuckets * filesPerBucket, col("tb"), col("w"))
          .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
          .write.partitionBy("tb").mode("overwrite").parquet(out)
      }
      time(s"  n$i-index") {
        graft.sinks.SkippingStore.indexPartitioned(spark, out, Seq("w"))
      }
      time(s"  n$i-obsget")(obs.get: Unit)
      val files = graft.sinks.SkippingStore.listDataFileRelPaths(spark, out)
        .map(rel => s"$out/$rel")
      val written = spark.read.parquet(files: _*)
      time(s"  n$i-doclen") {
        written.select(col("doc_id"), col("dl")).dropDuplicates("doc_id")
          .write.mode("append").parquet(s"$out/_doclen")
      }
      time(s"  n$i-bits") {
        written.select(col("w")).distinct()
          .select(explode(array((0 until 4).map(k =>
            pmod(xxhash64(col("w"), lit(k)), lit((1 << 17).toLong))): _*))
            .as("p"))
          .groupBy((col("p") / 64).cast("int").as("word"))
          .agg(expr("bit_or(shiftleft(1L, cast(p % 64 AS int)))").as("bits"))
          .collect(): Unit
      }
      import spark.implicits._
      Seq((-1L, 5000L, 270704L, nBuckets)).toDF("bid", "n", "sdl", "nbuckets")
        .coalesce(1).write.mode("append").parquet(s"$out/_corpus_stats")
    }

    val olds = collection.mutable.Buffer[Double]()
    val news = collection.mutable.Buffer[Double]()
    val reals = collection.mutable.Buffer[Double]()
    (1 to 4).foreach { i =>
      olds += time(s"old#$i")(oldBuild(tmp(i, "old")))
      news += time(s"new#$i")(newBuild(tmp(i, "new"), i))
      reals += time(s"real#$i") {
        graft.operators.TextIndex.build(docs, "doc_id", "text",
          tmp(i, "real"), nBuckets = 8, filesPerBucket = 2)
      }
    }
    println(f"PROFILE old-min ${olds.min}%.2f  new-min ${news.min}%.2f  real-min ${reals.min}%.2f")
    spark.stop()
  }
}
