package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-inspection entry point: prints `explain("formatted")` for the named
  * SparkEntry queries (or a default set) — used to audit pushdown
  * (PushedFilters/ReadSchema), broadcast choices, and whole-stage-codegen
  * spans without executing anything.
  *
  * Usage: Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_filter", "q04_agg", "q07_join_inner", "kg_linked", "sim_topk")
    val spark = graft.util.Sessions.local(4, appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
