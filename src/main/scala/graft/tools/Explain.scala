package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-inspection harness: prints the formatted physical plan of the
  * named queries (default: a representative set) so scans, pushed
  * filters, join strategies and codegen spans can be eyeballed per the
  * scale checklist in the builder brief.
  *
  * usage: runMain graft.tools.Explain <sfDir> [q1_agg q2_multijoin ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
    else Seq("q1_agg", "q2_multijoin", "q3_anti", "q12_window_dedup",
      "q29_jaccard", "q31_cosine_topk")
    val spark = GraftSession.local(8)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
