package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries. Usage:
  * QueryBench <sfDir> <queryName> [queryName...] — one shared session, so
  * memoized-graph queries behave as in graft.Bench's sweep.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.util.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, appName = "graft-qbench")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[qbench] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
