package graft.sinks

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The store-maintenance rewrites must run through the Hadoop
  * `FileSystem` API end-to-end: a `file:`-qualified URI (which a
  * `java.io.File` walk would have mangled into a path literally named
  * "file:/...") has to compact, expire, and postings-compact exactly
  * like a bare local path — the proof the same code lands on an
  * `hdfs:` root unchanged. */
class HadoopSwapSpec extends SparkSpec {
  import spark.implicits._

  test("compact + expire work on a file:-qualified Hadoop path") {
    val dir = "file:" +
      java.nio.file.Files.createTempDirectory("hswap").toString + "/t"
    val rows = (0L until 2000L).map(i =>
      (i, s"2024-01-${"%02d".format((i % 28) + 1)}", s"p-$i"))
      .toDF("id", "day", "v")
    rows.repartition(16).write.mode("overwrite").parquet(dir)
    val before = rows.collect().toSet
    val (nBefore, nAfter) = StoreMaintenance.compact(spark, dir, 512 * 1024)
    assert(nBefore == 16 && nAfter < 16,
      s"qualified-URI compact must shrink files ($nBefore -> $nAfter)")
    assert(spark.read.parquet(dir).collect().toSet == before)
    val dropped = StoreMaintenance.expire(spark, dir, "day", "2024-01-15")
    assert(dropped > 0 &&
      spark.read.parquet(dir).count() + dropped == 2000L)
    // the swap left no rewrite debris beside the store
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    val fs = HadoopSwap.fs(spark, dir)
    val leftovers = fs.listStatus(parent).map(_.getPath.getName)
      .filter(n => n.contains(".rewrite-") || n.contains(".old-"))
    assert(leftovers.isEmpty, s"swap debris: ${leftovers.mkString(",")}")
  }

  test("compactIvfStore works on a file:-qualified Hadoop path") {
    val root = java.nio.file.Files.createTempDirectory("hswapivf").toString
    val dir = s"file:$root/store"
    def vec(i: Int): Seq[Float] =
      Seq.tabulate(8)(d => ((i * 31 + d * 7) % 19 - 9).toFloat / 10f)
    val emb = (0 until 96).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val index = Similarity.trainIvf(emb, "vec_id", "embedding", 4)
    Similarity.ivfStoreBuild(emb, "vec_id", "embedding", index, dir)
    // small-file decay: three appends, one file per cell per batch
    (96 until 144 by 16).foreach { from =>
      val b = (from until from + 16).map(i => (i.toLong, vec(i)))
        .toDF("vec_id", "embedding")
      Similarity.ivfStoreAppend(b, "vec_id", "embedding", index, dir)
    }
    val servedBefore = Similarity.ivfStoreTopK(spark, dir, "vec_id",
      "embedding", vec(7), index, k = 5, nprobe = 4).collect().toSeq
    val (was, now) = Similarity.compactIvfStore(spark, dir)
    assert(was > now, s"qualified-URI postings compact must shrink ($was -> $now)")
    assert(spark.read.parquet(dir).count() === 144)
    val servedAfter = Similarity.ivfStoreTopK(spark, dir, "vec_id",
      "embedding", vec(7), index, k = 5, nprobe = 4).collect().toSeq
    assert(servedAfter == servedBefore, "serve results must survive the swap")
  }

  test("a failed tmp rename aborts with the live store intact") {
    val dir = "file:" +
      java.nio.file.Files.createTempDirectory("hswapfail").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(dir)
    // tmp never written: the first rename-aside must not fire either
    intercept[IllegalArgumentException] {
      HadoopSwap.swapInto(spark, dir + ".rewrite-missing", dir, dir + ".old-x")
    }
    assert(spark.read.parquet(dir).count() == 2, "live store must survive")
  }
}
