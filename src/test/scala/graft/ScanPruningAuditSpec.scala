package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Mechanizes the "push down and prune" sweep the way
  * CartesianAuditSpec mechanized the cartesian sweep: for every
  * registry query, every scan of a SOURCE table (the sf-dir parquet
  * files — derived scratch stores are out of scope) must read a strict
  * subset of the table's columns unless the query is documented here
  * as genuinely full-width. A scan that reads all 16 lineitem columns
  * for a 2-column aggregate means column pruning broke — free
  * performance left on the table at 100 TB, and the regression is
  * silent without this audit.
  *
  * Narrow tables (≤4 columns) are not audited: reading all of
  * region(3) is not a pruning failure.
  */
class ScanPruningAuditSpec extends SparkSpec {

  /** (query, table) pairs that legitimately read every column of a
    * wide source table. EMPTY as of round 7: even the profiler, the
    * dataset card, and the JSONL re-serialization scan strict subsets.
    * Keep one line of WHY per future entry; staleness is enforced (an
    * exemption with no full-width scan behind it fails the audit). */
  private val fullWidthOk: Set[(String, String)] = Set.empty

  test("every wide source-table scan prunes columns or is documented") {
    val sfDir = "/root/testdata/sf0.001"
    val widths: Map[String, Int] = Map(
      "lineitem" -> 16, "orders" -> 9, "customer" -> 8, "part" -> 9,
      "supplier" -> 7, "nation" -> 4, "region" -> 3)
      .map { case (t, w) => t -> w } ++
      Seq("events", "documents", "embeddings").map { t =>
        t -> spark.read.parquet(s"$sfDir/$t.parquet").schema.size
      }.toMap
    val tableOf = "/(\\w+)\\.parquet".r
    val offenders = scala.collection.mutable.ArrayBuffer[(String, String, Int)]()
    val seenFull = scala.collection.mutable.Set[(String, String)]()
    AuditPlans.frames.foreach { case (name, df) =>
      val plan = df.queryExecution.sparkPlan
      plan.foreach {
        case s: FileSourceScanExec =>
          val roots = s.relation.location.rootPaths.map(_.toString)
          val tables = roots.flatMap(p =>
            tableOf.findFirstMatchIn(p).map(_.group(1)))
            .filter(widths.contains).distinct
          tables.foreach { t =>
            val width = widths(t)
            val readCols = s.requiredSchema.size
            if (width > 4 && readCols >= width) {
              seenFull += (name -> t)
              if (!fullWidthOk.contains(name -> t))
                offenders += ((name, t, readCols))
            }
          }
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      "full-width scan of a wide source table (prune the projection or " +
        "document it in fullWidthOk): " +
        offenders.distinct.map { case (q, t, n) => s"$q[$t:$n cols]" }
          .mkString(", "))
    // exemptions must not outlive the plans they bless
    val stale = fullWidthOk.filterNot(seenFull)
    assert(stale.isEmpty,
      s"stale fullWidthOk entries (scan prunes now): ${stale.mkString(", ")}")
  }
}
