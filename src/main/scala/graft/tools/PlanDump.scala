package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print the formatted physical plan of one `SparkEntry.queries` row —
  * the capture tool behind PLANS.md (build side effects run first, so
  * the dumped plan is the SERVE's, with AQE finalized by an execute).
  *
  * usage: runMain graft.tools.PlanDump <query> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <query> [sfDir]")
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(8))
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalize AQE so the printed plan is the real one
    println(s"== $name @ $sfDir ==")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
