package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] that composes the transparent sidecar prune with a
  * PARTITIONED store's own directory pruning: every listing delegates
  * to the underlying index — so Spark's partition pruning still runs
  * on the partition filters exactly as before — and the returned files
  * are then intersected with the sidecar's survivor set (keyed by
  * partition-relative path, the [[graft.sinks.SkippingStore
  * .indexPartitioned]] convention). The flat-store path swaps in an
  * `InMemoryFileIndex` over leaf files instead; that would ERASE the
  * partition schema here, which is why partitioned relations wrap
  * rather than replace. [[ZonePruneRule]] recognizes this class as its
  * own output and leaves it alone — the partitioned fixed point. */
class PrunedFileIndex(underlying: FileIndex, keep: Set[String])
    extends FileIndex {

  /** Trailing `k=v` directory segments + file name — the same relative
    * key the sidecar records, derived structurally from the path so no
    * URI-scheme normalization seam exists. */
  private def rel(p: Path): String = {
    var segs = List(p.getName)
    var cur = p.getParent
    while (cur != null && cur.getName.contains("=")) {
      segs = cur.getName :: segs
      cur = cur.getParent
    }
    segs.mkString("/")
  }

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                         dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep(rel(f.getPath)))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(p => keep(rel(new Path(p))))

  override def refresh(): Unit = underlying.refresh()

  // a conservative upper bound is all the planner needs; re-listing to
  // subtract the pruned files would pay a driver pass for stats only
  override def sizeInBytes: Long = underlying.sizeInBytes

  override def partitionSchema: StructType = underlying.partitionSchema
}
