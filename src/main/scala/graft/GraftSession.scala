package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Local runs use `local[N]`; on a real cluster the same settings apply
  * (AQE on, sane shuffle partitioning, UTC). Shuffle partitions default to
  * the core count locally — on a 1000-executor cluster AQE coalesces the
  * initial number down, so we set a large initial value there instead.
  */
object GraftSession {

  /** The settings that change between local[] and a 1000-executor
    * cluster, in one place. Local keeps shuffle partitions at core
    * count; the cluster profile starts high and lets AQE coalesce,
    * turns on skew-join splitting, and bounds scan partition size so a
    * 100 TB input plans ~800k well-sized tasks rather than a few huge
    * ones. */
  val clusterConf: Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> "2000", // AQE coalesces down
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
    // filterless MIN/MAX/COUNT over V2 parquet scans resolve from footer
    // statistics. NOTE: parquet sits on the V1 source path by default
    // (spark.sql.sources.useV1SourceList), so this only engages for jobs
    // that clear that list — in particular the streamed-dedup replay
    // gate's max(_applied_batch) stays a column-pruned scan of one
    // RLE-compressed long column (its mergeSchema read would preclude
    // pushdown anyway); don't size restart budgets assuming O(files)
    "spark.sql.parquet.aggregatePushdown" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Builder pre-loaded with [[clusterConf]] + engine extensions; the
    * caller adds master/deploy settings. */
  def clusterBuilder(): SparkSession.Builder =
    clusterConf.foldLeft(
      SparkSession.builder().appName("graft").withExtensions(new GraftExtensions)
    ) { case (b, (k, v)) => b.config(k, v) }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
