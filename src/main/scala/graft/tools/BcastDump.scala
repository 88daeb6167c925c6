package graft.tools

import graft.{PlanAudit, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Dev tool behind BroadcastAuditSpec: print every FORCED broadcast
  * hint (`HINT query cols`) and every physical broadcast exchange
  * (`BCAST query cols`) across the registry — the feedback loop for
  * deciding whether a new broadcast is bounded and which documented
  * family it belongs to. Not part of the driver contract. */
object BcastDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        df.queryExecution.analyzed.foreach {
          case h: ResolvedHint if h.hints.strategy.nonEmpty =>
            println(s"HINT\t$name\t${h.child.output.map(_.name).sorted.mkString(",")}")
          case _ =>
        }
        PlanAudit.broadcastOutputs(df.queryExecution.executedPlan)
          .foreach(s => println(s"BCAST\t$name\t${s.toSeq.sorted.mkString(",")}"))
      } catch { case e: Throwable => println(s"ERR\t$name\t${e.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
