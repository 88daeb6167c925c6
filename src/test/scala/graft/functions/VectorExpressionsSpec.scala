package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim is bit-identical to the composable aggregate/zip_with form") {
    val emb = Seq(
      (1L, Array(0.3f, -1.2f, 7.5f, 0.001f), Array(2.0f, 0.5f, -0.25f, 9f)),
      (2L, Array(1f, 0f, 0f, 0f), Array(1f, 0f, 0f, 0f)))
      .toDF("id", "a", "b")
    val composable = expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v) / " +
        "(sqrt(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)) * " +
        " sqrt(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))")
    val rows = emb.select(
      VectorFunctions.cosine_sim($"a", $"b").as("native"), composable.as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, r) => assert(n == r, s"native $n != composable $r") }
    assert(rows(1)._1 == 1.0)
  }

  test("cosine_sim handles nulls and survives codegen") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine_sim($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
  }

  test("minhash_md5 matches the exploded groupBy signature exactly") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different words in this one here now"))
      .toDF("doc_id", "text")
    val viaShuffle = Dedup.minhashSignature(
      Dedup.shingles(docs, "doc_id", "text", 3), 8)
      .orderBy($"doc_id").collect().map(_.toSeq)
    val direct = Dedup.minhashSignatureDirect(docs, "doc_id", "text", 3, 8)
      .orderBy($"doc_id").collect().map(_.toSeq)
    assert(viaShuffle.toSeq == direct.toSeq)
  }

  test("SQL registration via GraftExtensions works end-to-end") {
    // GraftSession builds with extensions; here register on the shared
    // test session via the function-registry path
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").as[Double].collect()
    assert(got.head == 1.0)
    val mh = spark.sql(
      "SELECT minhash_md5(array('a b c', 'b c d'), 2)")
      .collect().head.getSeq[String](0)
    assert(mh.length == 2 && mh.forall(_.length == 32))
    val un = spark.sql(
      "SELECT unicode_normalize('A\u0301', 'NFC')").as[String].collect()
    assert(un.head == "\u00c1") // A + combining acute composes
  }
}

/** Null handling at the top-k boundary: unrankable (null-scored) rows
  * are dropped by the call-site filter — the aggregator itself keeps
  * the strict primitive encoder (a boxed null-tolerant one measured
  * ~3x slower on the kNN join). */
class TopKNullSpec extends graft.SparkSpec {
  import spark.implicits._
  test("the knnJoin null-filter boundary keeps top_k null-free") {
    val df = Seq((1L, Some(0.9)), (2L, None), (3L, Some(0.5)))
      .toDF("id", "score")
    val got = df.filter($"score".isNotNull) // the call-site contract
      .groupBy()
      .agg(TopK.top_k(2)($"id", $"score").as("hits"))
      .selectExpr("explode(hits) as h").select("h._1", "h._2")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 0.9), (3L, 0.5)))
  }

  test("top_k_tagged: same ranking as top_k (NaN first, id tiebreak); tag is cargo") {
    // ties + NaN, and tags chosen so sorting BY tag would reorder —
    // proving the tag never participates in the comparator
    val df = Seq((1L, 0.5, 99L), (2L, Double.NaN, 1L), (3L, 0.5, 0L),
      (4L, 0.9, 50L), (5L, 0.1, 7L)).toDF("id", "score", "tag")
    val tagged = df.groupBy()
      .agg(TopK.top_k_tagged(4)($"id", $"score", $"tag").as("hits"))
      .selectExpr("explode(hits) as h").select("h._1", "h._2", "h._3")
      .as[(Long, Double, Long)].collect().toSeq
    val plain = df.groupBy()
      .agg(TopK.top_k(4)($"id", $"score").as("hits"))
      .selectExpr("explode(hits) as h").select("h._1", "h._2")
      .as[(Long, Double)].collect().toSeq
    assert(tagged.map(t => (t._1, t._2)).map { case (i, s) =>
      (i, if (s.isNaN) -1.0 else s) } ==
      plain.map { case (i, s) => (i, if (s.isNaN) -1.0 else s) })
    assert(tagged.map(t => t._1 -> t._3).toMap ==
      Map(1L -> 99L, 2L -> 1L, 3L -> 0L, 4L -> 50L))
  }

  test("NearestCellBroadcast at 4096 cells: same assignment, no codegen fallback, flat expression payload") {
    val nCells = 4096
    val dim = 8
    val cids: Seq[Int] = 0 until nCells
    val cents: Seq[Seq[Double]] = Seq.tabulate(nCells)(k =>
      Seq.tabulate(dim)(i => ((k * 31 + i * 7) % 97).toDouble / 97.0))
    val sc = spark.sparkContext
    val cb = sc.broadcast(cids.toArray)
    val mb = sc.broadcast(cents.map(_.toArray).toArray)
    val vecs = Seq.tabulate(200)(r =>
        (r.toLong, Array.tabulate(dim)(i => ((r * 13 + i * 5) % 89).toFloat / 89f)))
      .toDF("id", "e")
    // fallback=false makes a janino failure throw instead of silently
    // dropping to interpreted mode — this IS the no-fallback assertion
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val plain = vecs.select($"id",
          VectorFunctions.nearest_cell($"e", cids, cents).as("c"))
        .as[(Long, Int)].collect().toMap
      val viaBc = vecs.select($"id",
          VectorFunctions.nearest_cell_bcast($"e", cb, mb).as("c"))
        .as[(Long, Int)].collect().toMap
      assert(viaBc == plain && plain.size == 200)
      assert(plain.values.toSet.size > 1) // assignments actually vary
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    // the broadcast form serializes HANDLES, not the centroid matrix —
    // this is what keeps the per-stage task binary flat at 64k+ cells
    def serializedSize(e: Any): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(e); oos.close(); bos.size()
    }
    import org.apache.spark.sql.graft.ColumnBridge
    val probe = lit(null).cast("array<float>")
    val plainSz = serializedSize(
      ColumnBridge.expression(VectorFunctions.nearest_cell(probe, cids, cents)))
    val bcSz = serializedSize(
      ColumnBridge.expression(VectorFunctions.nearest_cell_bcast(probe, cb, mb)))
    assert(bcSz < plainSz / 10,
      s"broadcast form $bcSz B should be tiny vs matrix-state form $plainSz B")
  }
}
