package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.plans.Pipeline
import graft.sources.TranscriptGen

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, then measures full-pipeline throughput (turns/sec) at
  * two parallelism levels — local[8] vs local[32] on identical input — as
  * the sandbox proxy for the N vs 4N executor-cluster scaling-efficiency
  * criterion (BASELINE.md). Prints exactly ONE JSON line.
  *
  * Scaling protocol (round-2 fix — the round-1 single-trial numbers were
  * load-contaminated): configs run INTERLEAVED (lo, hi, lo, hi, …) so
  * external host load hits both configs alike; /proc/loadavg is recorded
  * before each trial; the reported throughput per config is the MEDIAN of
  * load-clean trials (1-min loadavg ≤ GRAFT_BENCH_CLEAN_LOAD, default 8.0 —
  * falls back to all trials when none are clean, flagged in the JSON).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = graft.util.Sessions.local(cores, appName = s"graft-bench-$cores")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def rmrf(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val stream = Files.walk(p) // close to release directory handles
      try stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally stream.close()
    }
  }

  private def loadavg1(): Double =
    scala.util.Try(new String(Files.readAllBytes(Paths.get("/proc/loadavg")))
      .split(" ")(0).toDouble).getOrElse(-1.0)

  /** External CPU contention: /proc/stat busy fraction sampled while this
    * JVM is idle (between trials). Preferred over loadavg for the clean
    * filter — the 1-min loadavg decays slowly, so after an interleaved
    * 32-core trial it reflects OUR previous trial, not the host.
    */
  private def cpuBusyFrac(sampleMs: Long = 3000): Double =
    scala.util.Try {
      def read(): (Long, Long) = {
        val line = Files.readAllLines(Paths.get("/proc/stat")).get(0)
        val f = line.trim.split("\\s+").drop(1).map(_.toLong)
        (f(3) + f(4), f.sum) // (idle+iowait, total)
      }
      val (i0, t0) = read(); Thread.sleep(sampleMs); val (i1, t1) = read()
      val dt = (t1 - t0).toDouble
      if (dt <= 0) -1.0 else 1.0 - (i1 - i0) / dt
    }.getOrElse(-1.0)

  private final case class Trial(cores: Int, turns: Long, sec: Double,
      load: Double, extBusy: Double, achievedCores: Double,
      stages: Seq[(String, Double)]) {
    def tput: Double = turns / sec
  }

  private def procCpuNs: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime

  /** One full pipeline run at the given parallelism. `achievedCores` =
    * process CPU seconds / wall seconds — the in-trial contamination signal:
    * on this shared host, co-tenant bursts (minutes long, invisible to
    * pre-trial sampling) show up as the JVM achieving far less parallelism
    * than requested.
    */
  private def pipelineRun(cores: Int, nConv: Long): Trial = {
    val dir = s"/tmp/graft-bench-$cores-$nConv"
    rmrf(dir)
    val load = loadavg1()
    val extBusy = cpuBusyFrac()
    val spark = session(cores)
    val cpu0 = procCpuNs
    val t0 = System.nanoTime()
    val r = Pipeline.run(spark, Pipeline.Config(dir,
      TranscriptGen.Config(nConv = nConv), checkpoint = "final"))
    val sec = (System.nanoTime() - t0) / 1e9
    val achieved = (procCpuNs - cpu0) / 1e9 / sec
    val stages = r.stages.map(s => s.stage -> s.wallMs / 1000.0)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    rmrf(dir)
    Trial(cores, r.turns, sec, load, extBusy, achieved, stages)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) Double.NaN
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    // the one JSON output line is built with f"" (String.format) — pin the
    // locale so decimal points never render as commas
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 400k conversations (~8.6M turns): at 100k the pipeline is stage-latency
    // bound and local[8] under-measures CPU (per-turn core-µs differ 2×
    // between configs); at 400k both configs pay the same per-turn CPU and
    // the proxy reflects real parallel scaling
    val nConv = sys.env.getOrElse("GRAFT_BENCH_CONV", "400000").toLong

    val skipQueries = sys.env.contains("GRAFT_BENCH_SKIP_QUERIES")
    val failures = Seq.newBuilder[String]
    val results =
      if (skipQueries) Seq.empty[(String, Double)]
      else {
        val spark = session(cpus)
        val rs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val t0 = System.nanoTime()
          // a crashing query must NOT masquerade as a normal timing row:
          // record it in query_failures (and rc) instead of swallowing
          try { fn(spark, sfDir).count() } catch {
            case e: Throwable =>
              failures += name
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        rs
      }
    val failed = failures.result()

    // scaling evidence: identical pipeline job at N and 4N cores,
    // interleaved trials, median of load-clean trials per config.
    val loCores = sys.env.getOrElse("GRAFT_BENCH_CORES_LOW", "8").toInt
    val hiCores = sys.env.getOrElse("GRAFT_BENCH_CORES_HIGH", "32").toInt
    val trials = sys.env.getOrElse("GRAFT_BENCH_TRIALS", "3").toInt
    // Clean-trial filter, self-calibrating: the pipeline's CPU cost per turn
    // (achieved cores × wall / turns) is config-independent at this corpus
    // size, so the minimum across ALL trials is the uncontaminated cost and
    // any trial burning > cpuFactor × that was externally disturbed.
    // This catches what pre-trial sampling and utilization floors cannot:
    // co-tenant cache/bandwidth thrash makes our threads BURN cpu while
    // doing less work — utilization looks fine, per-turn CPU does not.
    val cpuFactor = sys.env.getOrElse("GRAFT_BENCH_CPU_FACTOR", "1.4").toDouble
    pipelineRun(hiCores, math.max(nConv / 10, 200)) // warmup: JIT/codegen/heap-touch
    val all = (1 to trials).flatMap(_ =>
      Seq(pipelineRun(loCores, nConv), pipelineRun(hiCores, nConv)))
    val bestCpuPerTurn = all.map(t => t.achievedCores * t.sec / t.turns).min
    def pick(cores: Int): (Seq[Trial], Boolean) = {
      val ts = all.filter(_.cores == cores)
      val clean = ts.filter(t =>
        t.achievedCores * t.sec / t.turns <= cpuFactor * bestCpuPerTurn)
      // no clean trial for this config ⇒ least-contaminated (highest tput)
      // trial, flagged false in the JSON
      if (clean.nonEmpty) (clean, true) else (Seq(ts.maxBy(_.tput)), false)
    }
    val (lo, loClean) = pick(loCores)
    val (hi, hiClean) = pick(hiCores)
    val tputLo = median(lo.map(_.tput))
    val tputHi = median(hi.map(_.tput))
    val eff = (tputHi / tputLo) / (hiCores.toDouble / loCores)
    // stage breakdown from the trial closest to the median throughput
    def repr(ts: Seq[Trial], m: Double): Trial = ts.minBy(t => math.abs(t.tput - m))
    val stagesLo = repr(lo, tputLo).stages
    val stagesHi = repr(hi, tputHi).stages
    val secLo = median(lo.map(_.sec))
    val secHi = median(hi.map(_.sec))

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def stagesJson(st: Seq[(String, Double)]): String =
      st.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    val trialsJson = all.map(t =>
      f"""{"cores":${t.cores},"sec":${t.sec}%.2f,"turns_per_sec":${t.tput}%.1f,""" +
        f""""loadavg":${t.load}%.2f,"ext_busy":${t.extBusy}%.3f,""" +
        f""""achieved_cores":${t.achievedCores}%.1f}""")
      .mkString("[", ",", "]")
    val scaling = f"""{"n_conv":$nConv,"turns":${all.head.turns},""" +
      f""""sec_8":$secLo%.2f,"sec_32":$secHi%.2f,""" +
      f""""turns_per_sec_8":$tputLo%.1f,"turns_per_sec_32":$tputHi%.1f,""" +
      f""""scaling_efficiency":$eff%.3f,""" +
      f""""protocol":{"trials_per_config":$trials,"interleaved":true,""" +
      f""""clean_rule":"cpu_per_turn<=${cpuFactor}%.1fx_best",""" +
      f""""best_cpu_us_per_turn":${bestCpuPerTurn * 1e6}%.1f,""" +
      f""""lo_used_clean":$loClean,"hi_used_clean":$hiClean,""" +
      f""""trials":$trialsJson},""" +
      f""""stage_sec_8":${stagesJson(stagesLo)},"stage_sec_32":${stagesJson(stagesHi)}}"""
    val failJson = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""query_failures":$failJson,"sf":"$sfDir","pipeline_scaling":$scaling}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
