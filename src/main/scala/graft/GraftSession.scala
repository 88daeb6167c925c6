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
    // bounded-buffer typed aggregators (TopK, the kNN-join spine) hold
    // thousands of SMALL per-group buffers per map task; Spark's default
    // ObjectHashAggregate fallback threshold (128 in-memory groups)
    // degrades them to sort-based aggregation with per-row buffer
    // serialization — measured 2x+ on corpus-scale sweeps (q218). The
    // buffers here are k-bounded, so holding thousands is cheap; truly
    // unbounded collect_list shapes in this engine group by file and
    // stay far below this count anyway.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "4096",
    "spark.sql.parquet.aggregatePushdown" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Every read of a sidecar-bearing store makes Spark's DataSource
    * log `All paths were ignored: .../_zonemap_multi` at WARN — one
    * line per sidecar dir per read, hundreds per bench, burying real
    * warnings. The underscore prefix is Spark's own "not data"
    * convention and the skip is exactly what we want — but ONLY for
    * this engine's own sidecar names: a blanket level raise on the
    * DataSource logger would also swallow its other WARNs (provider
    * fallback, schema warnings). So attach a message-matching DENY
    * filter for ignore lists naming the engine's sidecars, and leave
    * the logger's level alone. Idempotent across sessions. */
  def silenceSidecarListingNoise(): Unit = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{Filter, LoggerContext}
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.RegexFilter
    val name = "org.apache.spark.sql.execution.datasources.DataSource"
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    val existing = conf.getLoggerConfig(name)
    val lc =
      if (existing.getName == name) existing
      else {
        val fresh = new LoggerConfig(name, existing.getLevel, true)
        conf.addLogger(name, fresh)
        fresh
      }
    if (lc.getFilter == null) {
      // full-match regex (RegexFilter semantics) over the multi-line
      // message — DOTALL so the path list after the colon is covered
      lc.addFilter(RegexFilter.createFilter(
        "All paths were ignored.*/_(zonemap(_multi)?|bloommap|" +
          "corpus_stats|doclen|tombstones|positional|vocab|zorder_meta|" +
          "selcompact_(tmp|old)|constraints(_fk)?(_tmp)?|checkpoint).*",
        Array("DOTALL"), java.lang.Boolean.FALSE,
        Filter.Result.DENY, Filter.Result.NEUTRAL))
      ctx.updateLoggers()
    }
  }

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
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceSidecarListingNoise()
    spark
  }
}
