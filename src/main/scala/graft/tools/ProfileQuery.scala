package graft.tools

/** Time one driver-contract query repeatedly under sweep-true conditions
  * (same session shape and TempCaches release as `Bench`'s query sweep).
  *
  * Usage: ProfileQuery <queryName> [sfDir] [reps] [cores]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cores = if (args.length > 3) args(3).toInt else 32
    val spark = graft.util.Sessions.local(cores, appName = s"graft-profq-$name")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profq] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      graft.util.TempCaches.release(spark)
    }
    spark.stop()
  }
}
