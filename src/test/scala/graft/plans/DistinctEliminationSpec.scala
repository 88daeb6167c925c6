package graft.plans

import graft.SparkSpec
import graft.sinks.Constraints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

/** DISTINCT elimination + metadata count(DISTINCT) over declared-
  * unique keys: null-freedom gates the DISTINCT rewrite (null keys DO
  * collapse under grouping), uniqueness alone suffices for
  * count(DISTINCT), and every declaration re-validates its file-set
  * stamp per query. */
class DistinctEliminationSpec extends SparkSpec {
  import spark.implicits._

  private def plansAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty

  private lazy val store: String = {
    val dir = java.nio.file.Files.createTempDirectory("distelim").toString + "/s"
    val df = Seq((1L, "a", 10), (2L, "b", 20), (3L, "a", 30))
      .toDF("k", "label", "v")
    graft.sinks.SkippingStore.writeMulti(df, "k", Seq("k", "v"), dir, 2)
    Constraints.declareUnique(spark, dir, "k")
    dir
  }

  test("DISTINCT containing the unique null-free key is a no-op") {
    val d = spark.read.parquet(store).select($"k", $"label").distinct()
    assert(!plansAggregate(d), "unique+non-null key makes rows distinct")
    assert(d.count() == 3)
    // dropDuplicates on the key: first()-riders unwrap to the row
    val dd = spark.read.parquet(store).dropDuplicates("k").orderBy($"k")
    assert(!plansAggregate(dd))
    assert(dd.select($"v").as[Int].collect().toSeq == Seq(10, 20, 30))
  }

  test("DISTINCT on non-key columns keeps the aggregate") {
    val d = spark.read.parquet(store).select($"label").distinct()
    assert(plansAggregate(d), "label is not unique — must aggregate")
    assert(d.count() == 2)
  }

  test("count(DISTINCT key) answers from the sidecar; non-key scans") {
    val cd = spark.read.parquet(store).agg(countDistinct($"k").as("n"))
    assert(!PlanProbe.scansFiles(cd),
      "unique key: distinct non-null values = non-null rows")
    assert(cd.as[Long].head() == 3L)
    val cv = spark.read.parquet(store).agg(countDistinct($"v").as("n"))
    assert(PlanProbe.scansFiles(cv), "v has no unique declaration")
    assert(cv.as[Long].head() == 3L)
  }

  test("null keys block DISTINCT elimination but not count(DISTINCT)") {
    val dir = java.nio.file.Files.createTempDirectory("distelim2").toString + "/s"
    val df = Seq[(Option[Long], String)]((Some(1L), "a"), (None, "b"), (None, "c"))
      .toDF("k", "label")
    graft.sinks.SkippingStore.writeMulti(df, "k", Seq("k"), dir, 1)
    Constraints.declareUnique(spark, dir, "k") // nulls tolerated, recorded
    assert(Constraints.verifiedUnique(spark, dir, "k"))
    assert(!Constraints.verifiedUniqueNoNulls(spark, dir, "k"))
    val d = spark.read.parquet(dir).select($"k").distinct()
    assert(plansAggregate(d), "two null keys collapse — must aggregate")
    assert(d.count() == 2)
    // count(DISTINCT k) ignores nulls entirely: metadata-answerable
    val cd = spark.read.parquet(dir).agg(countDistinct($"k").as("n"))
    assert(!PlanProbe.scansFiles(cd))
    assert(cd.as[Long].head() == 1L)
  }

  test("an append since declaration falls back") {
    val dir = java.nio.file.Files.createTempDirectory("distelim3").toString + "/s"
    Seq((1L, "a"), (2L, "b")).toDF("k", "label").write.parquet(dir)
    Constraints.declareUnique(spark, dir, "k")
    Seq((2L, "dup")).toDF("k", "label").write.mode("append").parquet(dir)
    val d = spark.read.parquet(dir).select($"k").distinct()
    assert(plansAggregate(d), "stamp drifted — must aggregate")
    assert(d.count() == 2)
  }
}
