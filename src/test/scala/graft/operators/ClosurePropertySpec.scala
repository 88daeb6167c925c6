package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Model-based check for the path-doubling transitive closure: on random
  * DAGs, the Spark operator must produce EXACTLY the multiset of
  * (child, ancestor, dist) rows that brute-force path enumeration
  * produces — including one row per distinct path (cvtermpath
  * multiplicity), across depths that exercise the mixed
  * prefix-power/suffix rounds. A seeded suite rather than ScalaCheck so
  * each random DAG runs one Spark job, not hundreds.
  */
class ClosurePropertySpec extends SparkSpec {
  import spark.implicits._

  /** All paths by brute-force DFS over an acyclic edge list. */
  private def bruteForce(edges: Seq[(Long, Long)]): Seq[(Long, Long, Int)] = {
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def walk(from: Long, dist: Int): Seq[(Long, Int)] =
      out.getOrElse(from, Seq.empty).flatMap { next =>
        (next, dist + 1) +: walk(next, dist + 1)
      }
    edges.map(_._1).distinct.flatMap(c => walk(c, 0).map { case (a, d) => (c, a, d) })
  }

  private def check(edges: Seq[(Long, Long)], label: String): Unit = {
    val got = Closure.transitiveClosure(edges.toDF("child", "parent"))
      .as[(Long, Long, Int)].collect().toSeq.sorted
    val want = bruteForce(edges).sorted
    assert(got == want, s"$label: ${got.size} rows vs ${want.size} expected")
  }

  test("random DAGs: doubling closure equals brute-force path enumeration") {
    val rnd = new Random(42)
    for (trial <- 1 to 6) {
      val n = 8 + rnd.nextInt(8)
      // edges only from lower to higher ids -> acyclic by construction
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.25
      } yield (a.toLong, b.toLong)).toSeq
      if (edges.nonEmpty) check(edges, s"trial $trial (n=$n, e=${edges.size})")
    }
  }

  test("deep chain (depth 20, crosses several doubling rounds)") {
    check((1 until 21).map(i => (i.toLong, i.toLong + 1)), "chain20")
  }

  test("multi-diamond stacks multiply path counts") {
    // 1 -> {2,3} -> 4 -> {5,6} -> 7: four distinct 1~>7 paths, dist 4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 7L), (6L, 7L))
    check(edges, "diamond-stack")
    val four = Closure.transitiveClosure(edges.toDF("child", "parent"))
      .filter($"child" === 1L && $"ancestor" === 7L).collect()
    assert(four.length == 4 && four.forall(_.getInt(2) == 4))
  }
}
