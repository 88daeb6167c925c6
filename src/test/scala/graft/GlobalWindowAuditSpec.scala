package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Codifies VERDICT r5 #4: a partition-less window (`WindowExec: No
  * Partition Defined`) serializes the whole input through one task, so
  * no PRODUCTION fact-path query may plan one. The handful that do are
  * oracle-contract or dimension-sized-by-construction shapes, each
  * documented below; anything new fails this spec instead of scaling to
  * a single-task bottleneck at 100 TB.
  */
class GlobalWindowAuditSpec extends SparkSpec {

  /** Queries ALLOWED a partition-less window, and why it is safe. */
  private val exempt: Map[String, String] = Map(
    "q48_fk_stitch" -> ("oracle-form surrogate-id allocation over the NOVEL keys only; " +
      "the production path is IdAllocate.denseIds (per-partition ranges + prefix sum)"),
    "q119_export_order" -> ("the global GFF3 file position IS the oracle contract " +
      "for export order — a file has one line sequence"),
    "q141_shard_budget" -> ("largest-remainder ranking runs over domain STRATA, " +
      "a dimension-sized frame by construction (Curation.apportionBudget)"),
    "q163_temperature_mix" -> ("same allocateBudget largest-remainder ranking, " +
      "over language strata — dimension-sized by construction"),
    "q166_curation_v3" -> ("composed pipeline ends in the same allocateBudget " +
      "largest-remainder step over language strata"),
    "q199_zipf" -> ("rank assignment over the LIMIT(200)-bounded token " +
      "shortlist — the window's input is top-k-bounded by construction " +
      "(Curation.zipfFit)"),
    // NOT exempt: q118_stock_lines — its strainLines path takes
    // pre-assigned ids, so no global window reaches its plan; the
    // StockExport DSC_G%07d helper (dimension-sized legacy semantics)
    // is documented at StockExport.scala:23.
  )

  test("no production query plans a partition-less window") {
    val offenders = AuditPlans.frames.flatMap { case (name, df) =>
      val hasGlobal = df.queryExecution.analyzed.collectFirst {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }.isDefined
      if (hasGlobal) Some(name) else None
    }
    val undocumented = offenders.filterNot(exempt.keySet)
    assert(undocumented.isEmpty,
      s"undocumented partition-less windows in: ${undocumented.mkString(", ")} — " +
        "partition the window, or add a documented exemption to this spec")
    // exemptions must not outlive the shape they document
    val stale = exempt.keySet -- offenders.toSet
    assert(stale.isEmpty,
      s"stale exemptions (no partition-less window anymore): ${stale.mkString(", ")}")
  }
}
