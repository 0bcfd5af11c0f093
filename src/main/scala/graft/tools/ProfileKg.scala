package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profile of the heavy SparkEntry queries at a given sf dir.
  * Usage: ProfileKg [cores] [sfDir] [query...]
  */
object ProfileKg {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("kg_components", "kg_nodes", "kg_edges")
    val spark = graft.util.Sessions.local(cores, appName = "graft-profilekg")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      // sweep-true: Bench releases per-query tracked caches between queries
      graft.util.TempCaches.release(spark)
    }
    spark.stop()
  }
}
