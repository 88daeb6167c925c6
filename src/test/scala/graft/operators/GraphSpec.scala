package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank checks against closed-form / brute-force references: the
  * operator must reproduce the power iteration exactly (fixed rounds,
  * uniform start), conserve total mass to FP precision, and fold
  * dangling-node mass back uniformly.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side power iteration, the model implementation. */
  private def model(edges: Seq[(String, String, Long)], iters: Int,
                    d: Double = 0.85): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(outw.contains).map(pr).sum
      val contrib = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map(e => pr(e._1) * e._3.toDouble / outw(e._1)).sum
        }
      pr = nodes.map { v =>
        v -> ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))
      }.toMap
    }
    pr
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("two-node cycle is uniform at any round count") {
    val got = run(Seq(("a", "b", 1L), ("b", "a", 1L)), 7)
    assert(got.keySet == Set("a", "b"))
    got.values.foreach(v => assert(math.abs(v - 0.5) < 1e-12))
  }

  test("star graph concentrates rank on the hub; matches the model") {
    val edges = Seq(("s1", "hub", 1L), ("s2", "hub", 1L), ("s3", "hub", 1L),
      ("hub", "s1", 1L), ("hub", "s2", 1L), ("hub", "s3", 1L))
    val got = run(edges, 10)
    val want = model(edges, 10)
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, k) }
    assert(got("hub") > got("s1"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("dangling node mass is redistributed; total stays 1") {
    // c has no out-edges
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 2L))
    val got = run(edges, 8)
    val want = model(edges, 8)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, k) }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("weights matter: heavier edge pulls more rank") {
    val edges = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
    val got = run(edges, 12)
    val want = model(edges, 12)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, k) }
    assert(got("b") > got("c"))
  }

  test("zero iterations returns the uniform start") {
    val got = run(Seq(("a", "b", 1L), ("b", "c", 1L)), 0)
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }
}
