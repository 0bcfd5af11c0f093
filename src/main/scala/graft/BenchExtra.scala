package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only companion to [[Bench]] (the frozen driver harness): the
  * round-6 optimization loop needs per-query timings, noop-sink isolation
  * (guide §1.4) and `.explain("formatted")` dumps WITHOUT touching the hashed
  * harness. Methodology mirrors Bench's sweep exactly — same session shape
  * (Sessions.local(cpus) + 16m/1m file-split configs), same alphabetical
  * order, same `.count()` action, same TempCaches.release between queries —
  * so numbers are comparable to the driver's artifact.
  *
  * Usage:
  *   BenchExtra sweep   [sfDir] [reps]          — time every query, JSON line per rep
  *   BenchExtra time    <sfDir> <query...>      — time named queries (count + noop)
  *   BenchExtra explain <sfDir> <outDir> <suffix> [query...]
  *                                              — write <outDir>/<query>_<suffix>.txt
  *                                                plan dumps (default: all queries)
  */
object BenchExtra {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.util.Sessions.local(cpus, appName = s"graft-benchextra-$cpus")
    s.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    s.conf.set("spark.sql.files.openCostInBytes", "1m")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val warm = spark.read.parquet(s"$sfDir/nation.parquet")
    warm.groupBy(col("n_regionkey")).count().count()
    warm.join(broadcast(warm.select(col("n_nationkey").as("k"))),
      col("n_nationkey") === col("k")).count()
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val mode = if (args.nonEmpty) args(0) else "sweep"
    mode match {
      case "sweep" =>
        val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val reps = if (args.length > 2) args(2).toInt else 1
        val spark = session()
        warmup(spark, sfDir)
        (1 to reps).foreach { rep =>
          val results = Seq.newBuilder[(String, Double)]
          SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
            spark.sparkContext.setJobDescription(s"sweep:$name")
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            results += name -> (System.nanoTime() - t0) / 1e9
            graft.util.TempCaches.release(spark)
          }
          val rs = results.result()
          val qj = rs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
          println(f"""{"rep":$rep,"total":${rs.map(_._2).sum}%.3f,"queries":$qj}""")
        }
        spark.stop()

      case "time" =>
        val sfDir = args(1)
        val names = args.drop(2).toSeq
        val spark = session()
        warmup(spark, sfDir)
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          spark.sparkContext.setJobDescription(s"count:$name")
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val tCount = (System.nanoTime() - t0) / 1e9
          graft.util.TempCaches.release(spark)
          spark.sparkContext.setJobDescription(s"noop:$name")
          val t1 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val tNoop = (System.nanoTime() - t1) / 1e9
          graft.util.TempCaches.release(spark)
          println(f"[time] $name count=$tCount%.2fs noop=$tNoop%.2fs rows=$n")
        }
        spark.stop()

      case "explain" =>
        // Execute each query first (alphabetical order, shared session — the
        // sweep's steady state: memoized graph warm, cached subtrees
        // substituted), then dump the FINAL AQE plan (isFinalPlan=true) —
        // the plan the warm sweep actually runs, not the cold initial plan
        // that re-inlines the whole pipeline DAG below every cache boundary.
        val sfDir = args(1)
        val outDir = args(2)
        val suffix = args(3)
        val names = if (args.length > 4) args.drop(4).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        val spark = session()
        names.foreach { name =>
          try {
            val df = SparkEntry.queries(name)(spark, sfDir)
            val qe = df.queryExecution
            qe.toRdd.count() // executes the plan; AQE settles on its final form
            val plan = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"[explain] wrote $name")
          } catch {
            case e: Exception => println(s"[explain] $name FAILED: ${e.getMessage}")
          }
          graft.util.TempCaches.release(spark)
        }
        spark.stop()

      case other => sys.error(s"unknown mode '$other' (sweep|time|explain)")
    }
  }
}
