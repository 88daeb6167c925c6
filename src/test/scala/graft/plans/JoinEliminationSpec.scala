package graft.plans

import graft.SparkSpec
import graft.sinks.Constraints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** The unique-key join-elimination rule: a left-outer join to a
  * declared-unique store key whose columns nobody reads must vanish
  * from the optimized plan with an identical answer; every condition
  * the rule rests on (outer-ness, declaration validity, projection
  * scope, bare-attribute equality) must keep the join when violated. */
class JoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  private def plansJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.nonEmpty

  private lazy val stores: (String, DataFrame, DataFrame) = {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "label")
    val dir = java.nio.file.Files.createTempDirectory("joinelim").toString + "/dim"
    dim.write.parquet(dir)
    Constraints.declareUnique(spark, dir, "k")
    val fact = Seq((1L, 10), (1L, 20), (2L, 30), (9L, 40))
      .toDF("fk", "v")
    (dir, fact, dim)
  }

  test("fact-only projection over a unique-key left join drops the join") {
    val (dir, fact, _) = stores
    val dim = spark.read.parquet(dir)
    val q = fact.join(dim, fact("fk") === dim("k"), "left_outer")
      .groupBy($"fk").agg(sum($"v").as("s"))
      .orderBy($"fk")
    assert(!plansJoin(q), "unique-key left join should be eliminated")
    // identical to the actually-joined answer (kill-switch = ground truth)
    spark.conf.set("spark.graft.joinelim.enabled", "false")
    try {
      val ref = fact.join(dim, fact("fk") === dim("k"), "left_outer")
        .groupBy($"fk").agg(sum($"v").as("s")).orderBy($"fk")
      assert(plansJoin(ref))
      assert(q.collect().toSeq == ref.collect().toSeq)
    } finally spark.conf.set("spark.graft.joinelim.enabled", "true")
  }

  test("reading a dimension column keeps the join") {
    val (dir, fact, _) = stores
    val dim = spark.read.parquet(dir)
    val q = fact.join(dim, fact("fk") === dim("k"), "left_outer")
      .select($"fk", $"v", $"label")
    assert(plansJoin(q))
    assert(q.count() == 4L)
  }

  test("inner joins keep the join (they filter unmatched fact rows)") {
    val (dir, fact, _) = stores
    val dim = spark.read.parquet(dir)
    val q = fact.join(dim, fact("fk") === dim("k"))
      .groupBy($"fk").agg(sum($"v").as("s"))
    assert(plansJoin(q))
    assert(q.count() == 2L) // fk=9 filtered by the inner join
  }

  test("an append after declaration self-invalidates the constraint") {
    val (_, fact, dim) = stores
    val dir2 = java.nio.file.Files.createTempDirectory("joinelim2").toString + "/dim"
    dim.write.parquet(dir2)
    Constraints.declareUnique(spark, dir2, "k")
    // the append even REBREAKS uniqueness — elimination here would be wrong
    Seq((1L, "dup")).toDF("k", "label").write.mode("append").parquet(dir2)
    val d2 = spark.read.parquet(dir2)
    val q = fact.join(d2, fact("fk") === d2("k"), "left_outer")
      .groupBy($"fk").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .orderBy($"fk")
    assert(plansJoin(q), "stamped file set drifted — must not eliminate")
    // fk=1 fans out to 2 rows per fact row through the duplicate key
    assert(q.filter($"fk" === 1L).select($"n").as[Long].head() == 4L)
  }

  test("declareUnique refuses duplicate non-null keys, allows null dups") {
    val dupDir = java.nio.file.Files.createTempDirectory("joinelim3").toString + "/d"
    Seq((1L, "x"), (1L, "y")).toDF("k", "label").write.parquet(dupDir)
    intercept[IllegalArgumentException] {
      Constraints.declareUnique(spark, dupDir, "k")
    }
    val nullDir = java.nio.file.Files.createTempDirectory("joinelim4").toString + "/d"
    Seq[(Option[Long], String)]((None, "x"), (None, "y"), (Some(1L), "z"))
      .toDF("k", "label").write.parquet(nullDir)
    Constraints.declareUnique(spark, nullDir, "k") // null dups never match
    assert(Constraints.verifiedUnique(spark, nullDir, "k"))
  }

  test("extendUnique re-arms the constraint batch-sized after appends") {
    val (_, fact, dim) = stores
    val dir = java.nio.file.Files.createTempDirectory("joinelim5").toString + "/dim"
    dim.write.parquet(dir)
    Constraints.declareUnique(spark, dir, "k")
    // clean append: new keys, extend instead of full re-verify
    Seq((10L, "j"), (11L, "m")).toDF("k", "label")
      .write.mode("append").parquet(dir)
    assert(!Constraints.verifiedUnique(spark, dir, "k"), "stamp stale")
    Constraints.extendUnique(spark, dir, "k")
    assert(Constraints.verifiedUnique(spark, dir, "k"))
    assert(Constraints.verifiedUniqueNoNulls(spark, dir, "k"))
    val d = spark.read.parquet(dir)
    val q = fact.join(d, fact("fk") === d("k"), "left_outer")
      .groupBy($"fk").agg(sum($"v").as("s"))
    assert(!plansJoin(q), "extended declaration must re-arm elimination")
    // colliding append: extend refuses, constraint stays invalid
    Seq((10L, "dup")).toDF("k", "label").write.mode("append").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      Constraints.extendUnique(spark, dir, "k")
    }
    assert(ex.getMessage.contains("collide"))
    assert(!Constraints.verifiedUnique(spark, dir, "k"))
    // null keys in an append roll the null count forward
    val dir2 = java.nio.file.Files.createTempDirectory("joinelim6").toString + "/dim"
    dim.write.parquet(dir2)
    Constraints.declareUnique(spark, dir2, "k")
    Seq[(Option[Long], String)]((None, "x"), (Some(7L), "y")).toDF("k", "label")
      .write.mode("append").parquet(dir2)
    Constraints.extendUnique(spark, dir2, "k")
    assert(Constraints.verifiedUnique(spark, dir2, "k"))
    assert(!Constraints.verifiedUniqueNoNulls(spark, dir2, "k"))
  }

  test("declared foreign keys eliminate INNER joins; drift disarms them") {
    val root = java.nio.file.Files.createTempDirectory("fkelim").toString
    val (factDir, dimDir) = (s"$root/fact", s"$root/dim")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "label")
      .write.parquet(dimDir)
    Constraints.declareUnique(spark, dimDir, "k")
    Seq((1L, 10), (1L, 20), (2L, 30)).toDF("fk", "v")
      .write.parquet(factDir)
    Constraints.declareForeignKey(spark, factDir, "fk", dimDir, "k")
    val (fact, dim) = (spark.read.parquet(factDir), spark.read.parquet(dimDir))
    val q = fact.join(dim, fact("fk") === dim("k"))
      .groupBy($"fk").agg(sum($"v").as("s")).orderBy($"fk")
    assert(!plansJoin(q), "total+unique FK makes the inner join the identity")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 30L), (2L, 30L)))
    // fact on the RIGHT side of the join eliminates too
    val q2 = dim.join(fact, fact("fk") === dim("k"))
      .groupBy($"fk").agg(count(lit(1)).as("n"))
    assert(!plansJoin(q2))
    // reading a dim column keeps the join
    val q3 = fact.join(dim, fact("fk") === dim("k")).select($"v", $"label")
    assert(plansJoin(q3))
    // appending to the DIM side disarms the FK (its stamp covers both)
    Seq((9L, "z")).toDF("k", "label").write.mode("append").parquet(dimDir)
    val d2 = spark.read.parquet(dimDir)
    val q4 = fact.join(d2, fact("fk") === d2("k"))
      .groupBy($"fk").agg(sum($"v").as("s"))
    assert(plansJoin(q4), "dim stamp drifted — must not eliminate")
    // an orphan fk refuses at declaration time
    val orphanDir = s"$root/fact2"
    Seq((1L, 1), (7L, 2)).toDF("fk", "v").write.parquet(orphanDir)
    val ex = intercept[IllegalArgumentException] {
      Constraints.declareForeignKey(spark, orphanDir, "fk", dimDir, "k")
    }
    assert(ex.getMessage.contains("unique declaration first") ||
      ex.getMessage.contains("missing"))
  }

  test("extendForeignKey re-arms FK elimination batch-sized after fact appends") {
    val root = java.nio.file.Files.createTempDirectory("fkext").toString
    val (factDir, dimDir) = (s"$root/fact", s"$root/dim")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "label").write.parquet(dimDir)
    Constraints.declareUnique(spark, dimDir, "k")
    Seq((1L, 10), (2L, 30)).toDF("fk", "v").write.parquet(factDir)
    Constraints.declareForeignKey(spark, factDir, "fk", dimDir, "k")
    // clean fact append: new rows reference existing dim keys
    Seq((3L, 40), (1L, 50)).toDF("fk", "v").write.mode("append").parquet(factDir)
    assert(Constraints.verifiedForeignKey(spark, factDir, "fk").isEmpty,
      "fact stamp must be stale after the append")
    Constraints.extendForeignKey(spark, factDir, "fk")
    assert(Constraints.verifiedForeignKey(spark, factDir, "fk").isDefined)
    val (fact, dim) = (spark.read.parquet(factDir), spark.read.parquet(dimDir))
    val q = fact.join(dim, fact("fk") === dim("k"))
      .groupBy($"fk").agg(sum($"v").as("s")).orderBy($"fk")
    assert(!plansJoin(q), "extended FK must re-arm inner-join elimination")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 60L), (2L, 30L), (3L, 40L)))
    // an orphan append refuses; constraint stays invalid
    Seq((99L, 1)).toDF("fk", "v").write.mode("append").parquet(factDir)
    val ex = intercept[IllegalArgumentException] {
      Constraints.extendForeignKey(spark, factDir, "fk")
    }
    assert(ex.getMessage.contains("missing from"))
    assert(Constraints.verifiedForeignKey(spark, factDir, "fk").isEmpty)
    // dim-side drift refuses the extension outright (full re-declare)
    val (factDir2, dimDir2) = (s"$root/fact2", s"$root/dim2")
    Seq((1L, "a")).toDF("k", "label").write.parquet(dimDir2)
    Constraints.declareUnique(spark, dimDir2, "k")
    Seq((1L, 10)).toDF("fk", "v").write.parquet(factDir2)
    Constraints.declareForeignKey(spark, factDir2, "fk", dimDir2, "k")
    Seq((2L, "b")).toDF("k", "label").write.mode("append").parquet(dimDir2)
    Seq((1L, 20)).toDF("fk", "v").write.mode("append").parquet(factDir2)
    val ex2 = intercept[IllegalArgumentException] {
      Constraints.extendForeignKey(spark, factDir2, "fk")
    }
    assert(ex2.getMessage.contains("dim side changed"))
    // null fk in the appended batch refuses
    val (factDir3, dimDir3) = (s"$root/fact3", s"$root/dim3")
    Seq((1L, "a")).toDF("k", "label").write.parquet(dimDir3)
    Constraints.declareUnique(spark, dimDir3, "k")
    Seq((1L, 10)).toDF("fk", "v").write.parquet(factDir3)
    Constraints.declareForeignKey(spark, factDir3, "fk", dimDir3, "k")
    Seq[(Option[Long], Int)]((None, 7)).toDF("fk", "v")
      .write.mode("append").parquet(factDir3)
    val ex3 = intercept[IllegalArgumentException] {
      Constraints.extendForeignKey(spark, factDir3, "fk")
    }
    assert(ex3.getMessage.contains("null keys"))
  }

  test("a constraint declared on a pinned version survives later commits") {
    import graft.sinks.VersionedStore
    val dir = java.nio.file.Files.createTempDirectory("vconstraint").toString + "/d"
    VersionedStore.commit(Seq((1L, "a")).toDF("k", "label"), dir, 1)
    val v2 = VersionedStore.commit(Seq((2L, "b"), (3L, "c")).toDF("k", "label"), dir, 1)
    Constraints.declareUnique(spark, dir, "k", version = v2)
    val fact = Seq((1L, 10), (2L, 20), (9L, 30)).toDF("fk", "v")
    def agg(d: DataFrame) =
      fact.join(d, fact("fk") === d("k"), "left_outer")
        .groupBy($"fk").agg(sum($"v").as("s")).orderBy($"fk")
    // pinned v2 read: elimination fires
    val q2 = agg(VersionedStore.read(spark, dir, v2))
    assert(!plansJoin(q2), "snapshot-stamped constraint must eliminate on v2")
    assert(q2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L), (9L, 30L)))
    // a LATER commit (even one that breaks uniqueness going forward)
    // does not invalidate the immutable v2 snapshot's constraint
    val v3 = VersionedStore.commit(Seq((2L, "dup")).toDF("k", "label"), dir, 1)
    assert(!plansJoin(agg(VersionedStore.read(spark, dir, v2))),
      "v2 is immutable — its constraint outlives v3")
    // v3's file set differs from the stamp: refuses, join survives
    val q3 = agg(VersionedStore.read(spark, dir, v3))
    assert(plansJoin(q3), "v3 read must not borrow v2's constraint")
    // k=2 fans out through v3's duplicate — proof elimination would be wrong
    assert(q3.filter($"fk" === 2L).select($"s").as[Long].head() == 40L)
    // extendUnique on a versioned store refuses (snapshot discipline)
    val ex = intercept[IllegalArgumentException] {
      Constraints.extendUnique(spark, dir, "k")
    }
    assert(ex.getMessage.contains("versioned store"))
    // declarations are KEYED by version: declaring on another version
    // must not disarm v2's stamp (r8 ADVICE — the sidecar used to keep
    // one declaration per column, so the latest declare won)
    val v4 = VersionedStore.commit(
      Seq((7L, "x"), (8L, "y")).toDF("k", "label"), dir, 1, overwrite = true)
    Constraints.declareUnique(spark, dir, "k", version = v4)
    assert(!plansJoin(agg(VersionedStore.read(spark, dir, v4))),
      "v4's fresh declaration must arm v4")
    assert(!plansJoin(agg(VersionedStore.read(spark, dir, v2))),
      "v2's earlier declaration must STAY armed after declaring on v4")
  }

  test("kill-switch keeps the join") {
    val (dir, fact, _) = stores
    val dim = spark.read.parquet(dir)
    spark.conf.set("spark.graft.joinelim.enabled", "false")
    try {
      val q = fact.join(dim, fact("fk") === dim("k"), "left_outer")
        .groupBy($"fk").agg(sum($"v").as("s"))
      assert(plansJoin(q))
    } finally spark.conf.set("spark.graft.joinelim.enabled", "true")
  }
}
