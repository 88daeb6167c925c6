package graft.plans

import graft.SparkSpec
import graft.sinks.{Constraints, SkippingStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Model-based checks for the injected optimizer rules: on random
  * stores and random predicates, every rule-rewritten plan must return
  * EXACTLY what its kill-switched (stock-Spark) twin returns — the
  * rules may only remove work, never change an answer. Seeded trials,
  * the QuantPropertySpec discipline. */
class RulePropertySpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](k: String)(body: => A): A = {
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, "true")
  }

  test("metadata aggregates equal scan aggregates on random stores") {
    val rnd = new Random(41)
    for (trial <- 1 to 4) {
      val n = 50 + rnd.nextInt(150)
      val big = trial == 3 // exercise the 2^53 fallback guard
      val rows = (0 until n).map { i =>
        val k = i.toLong
        val v: java.lang.Long =
          if (rnd.nextInt(5) == 0) null
          else if (big) java.lang.Long.valueOf((1L << 53) + rnd.nextInt(1000))
          else java.lang.Long.valueOf(rnd.nextInt(100000).toLong - 50000L)
        val w: String =
          if (rnd.nextInt(7) == 0) null else f"s${rnd.nextInt(1000)}%04d"
        (k, v, w)
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"ruleprop$trial").toString + "/s"
      val df = rows.toDF("k", "v", "w")
      SkippingStore.writeMulti(df, "k", Seq("k", "v", "w"), dir,
        1 + rnd.nextInt(6))
      val store = spark.read.parquet(dir)
      def agg(d: DataFrame) = d.agg(
        min($"v").as("a"), max($"v").as("b"), count($"v").as("c"),
        min($"w").as("d"), max($"w").as("e"), count($"w").as("f"),
        count(lit(1)).as("g")).collect().toSeq
      val got = agg(store)
      val want = withConf("spark.graft.metaminmax.enabled") {
        withConf("spark.graft.metacount.enabled") { agg(store) }
      }
      assert(got == want, s"trial $trial (big=$big)")
      if (!big) // small values: the rewrite must actually engage
        assert(!PlanProbe.scansFiles(store.agg(min($"v"), count(lit(1)))),
          s"trial $trial should answer from metadata")
    }
  }

  test("zone-pruned filters equal unpruned filters on random predicates") {
    val rnd = new Random(43)
    for (trial <- 1 to 4) {
      val n = 100 + rnd.nextInt(200)
      val rows = (0 until n).map { i =>
        val v: java.lang.Long =
          if (rnd.nextInt(6) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(1000).toLong)
        (i.toLong, v, s"p${rnd.nextInt(10)}x$i")
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"zoneprop$trial").toString + "/s"
      SkippingStore.writeMulti(rows.toDF("k", "v", "w"), "k",
        Seq("k", "v", "w"), dir, 2 + rnd.nextInt(5))
      val store = spark.read.parquet(dir)
      val lo = rnd.nextInt(1000); val hi = lo + rnd.nextInt(400)
      val preds = Seq(
        $"v" >= lo && $"v" <= hi,
        $"v".isNull || $"v" > hi,
        $"v".isNotNull && $"w".startsWith(s"p${rnd.nextInt(10)}"),
        $"k".isin(Seq.fill(4)(rnd.nextInt(n).toLong): _*),
        ($"v" < lo || $"v".isNull) && $"k" >= n / 2)
      for ((p, i) <- preds.zipWithIndex) {
        val got = store.filter(p).collect().toSet
        val want = withConf("spark.graft.zoneprune.enabled") {
          store.filter(p).collect().toSet
        }
        assert(got == want, s"trial $trial predicate $i")
      }
    }
  }

  test("join/distinct elimination equals the executed twin on random dims") {
    val rnd = new Random(47)
    for (trial <- 1 to 3) {
      val nd = 20 + rnd.nextInt(50)
      val keys = rnd.shuffle((0L until 500L).toList).take(nd)
      val dim = keys.map(k => (k, s"l${rnd.nextInt(9)}")).toDF("k", "label")
      val dir = java.nio.file.Files
        .createTempDirectory(s"elimprop$trial").toString + "/dim"
      SkippingStore.writeMulti(dim, "k", Seq("k"), dir, 1 + rnd.nextInt(3))
      Constraints.declareUnique(spark, dir, "k")
      val d = spark.read.parquet(dir)
      val fact = (0 until 80).map(_ =>
        (rnd.nextInt(600).toLong, rnd.nextInt(100))).toDF("fk", "x")
        .localCheckpoint() // freeze the random frame across both runs
      val joined = fact.join(d, fact("fk") === d("k"), "left_outer")
        .groupBy($"fk").agg(sum($"x").as("s"), count(lit(1)).as("n"))
      val gotJ = joined.collect().toSet
      val wantJ = withConf("spark.graft.joinelim.enabled") {
        fact.join(d, fact("fk") === d("k"), "left_outer")
          .groupBy($"fk").agg(sum($"x").as("s"), count(lit(1)).as("n"))
          .collect().toSet
      }
      assert(gotJ == wantJ, s"trial $trial join")
      val gotD = d.dropDuplicates("k").collect().toSet
      val wantD = withConf("spark.graft.distinctelim.enabled") {
        d.dropDuplicates("k").collect().toSet
      }
      assert(gotD == wantD, s"trial $trial distinct")
    }
  }

  test("FK elimination after extendForeignKey equals the executed twin") {
    val rnd = new Random(53)
    for (trial <- 1 to 3) {
      val root = java.nio.file.Files
        .createTempDirectory(s"fkextprop$trial").toString
      val (factDir, dimDir) = (s"$root/fact", s"$root/dim")
      val nd = 20 + rnd.nextInt(30)
      val keys = rnd.shuffle((0L until 200L).toList).take(nd)
      keys.map(k => (k, s"l${rnd.nextInt(9)}")).toDF("k", "label")
        .write.parquet(dimDir)
      Constraints.declareUnique(spark, dimDir, "k")
      def factBatch(n: Int) = (0 until n).map(_ =>
        (keys(rnd.nextInt(keys.length)), rnd.nextInt(100))).toDF("fk", "x")
      factBatch(40).write.parquet(factDir)
      Constraints.declareForeignKey(spark, factDir, "fk", dimDir, "k")
      // two appended batches, extended (not re-declared) after each
      factBatch(15).write.mode("append").parquet(factDir)
      Constraints.extendForeignKey(spark, factDir, "fk")
      factBatch(15).write.mode("append").parquet(factDir)
      Constraints.extendForeignKey(spark, factDir, "fk")
      val (fact, d) = (spark.read.parquet(factDir), spark.read.parquet(dimDir))
      val q = fact.join(d, fact("fk") === d("k"))
        .groupBy($"fk").agg(sum($"x").as("s"), count(lit(1)).as("n"))
      assert(q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty, s"trial $trial: extended FK must eliminate the inner join")
      val got = q.collect().toSet
      val want = withConf("spark.graft.joinelim.enabled") {
        fact.join(d, fact("fk") === d("k"))
          .groupBy($"fk").agg(sum($"x").as("s"), count(lit(1)).as("n"))
          .collect().toSet
      }
      assert(got == want, s"trial $trial fk-extend")
    }
  }
}
