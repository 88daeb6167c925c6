package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Model-based check for min-label-propagation connected components: on
  * random undirected graphs the operator must assign every node the
  * minimum node id of its component — verified against a brute-force
  * union-find. Seeded suite (one Spark job per graph), like
  * [[ClosurePropertySpec]].
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force components via union-find. */
  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min id per root
    val minOf = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    nodes.map(n => n -> minOf(find(n))).toMap
  }

  test("random graphs: label propagation equals union-find components") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 6 + rnd.nextInt(10)
      val edges = (1 to n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val got = Components.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == bruteForce(edges), s"trial $trial: $edges")
    }
  }

  test("long chain converges (diameter > 1 round)") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = Components.connectedComponents(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 12L).map(_ -> 0L).toMap)
  }

  test("duplicateClusters keeps pair column names") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Components.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }
}
