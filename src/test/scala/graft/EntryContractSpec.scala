package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract, asserted: every registry query carries a DuckDB
  * oracle (a query without one silently downgrades to a rows-only
  * check), no oracle points at a missing query, and names follow the
  * qN_slug convention the correctness reports key on.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique qN_slug and N is not reused") {
    val names = SparkEntry.queries.keySet.toSeq
    val nums = names.map { n =>
      val m = "^q(\\d+)_[a-z0-9_]+$".r.findFirstMatchIn(n)
      assert(m.isDefined, s"bad query name: $n")
      m.get.group(1).toInt
    }
    val dups = nums.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate query numbers: $dups")
  }
}
