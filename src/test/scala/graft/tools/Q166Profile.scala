package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc A/B for the q166 drift: same query, session with or without
  * the graft extensions (SPARK_GRAFT_NOEXT=1 drops them), min-of-5. */
object Q166Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val noExt = sys.env.get("SPARK_GRAFT_NOEXT").contains("1")
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.ui.enabled", "false")
    val spark = (if (noExt) b0 else b0.withExtensions(new graft.GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.silenceSidecarListingNoise()
    graft.SparkEntry.queries("q1_agg")(spark, sfDir).count() // warm
    def one(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("q1_agg", "q166_curation_v3")) {
      val ts = (1 to 5).map(_ => one(q))
      println(f"PROFILE ext=${!noExt} $q min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
