package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.spark.sql.SparkSession

import graft.plans.Pipeline
import graft.sources.TranscriptGen

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, then measures full-pipeline throughput (turns/sec) at
  * two parallelism levels — local[8] vs local[32] on identical input — as
  * the sandbox proxy for the N vs 4N executor-cluster scaling-efficiency
  * criterion (BASELINE.md). Prints exactly ONE JSON line on stdout.
  *
  * Evidence survives partial runs (round-3 fix — round 2's bench hit the
  * driver's wall-clock limit and emitted NOTHING):
  *  - the in-progress JSON is rebuilt after every query timing and every
  *    pipeline trial and held in [[state]]; a JVM shutdown hook prints it
  *    (flagged `"partial":true`) if the process is killed before the final
  *    line — so a SIGTERM/timeout still ships every number measured so far;
  *  - the run is wall-clock-budget-aware (`GRAFT_BENCH_BUDGET_SEC`, default
  *    2400): before each interleaved trial pair the worst observed pair cost
  *    is charged against the remaining budget, and when it doesn't fit the
  *    loop stops scheduling trials and flags `"budget_truncated":true`. The
  *    first pair always runs (scaling evidence beats trial count).
  *
  * Scaling protocol: configs run INTERLEAVED (lo, hi, lo, hi, …) so external
  * host load hits both configs alike. Clean-trial rule (self-calibrating):
  * the pipeline's CPU cost per turn (achieved cores × wall / turns) is
  * config-independent at this corpus size, so the minimum across ALL trials
  * is the uncontaminated cost and any trial burning more than
  * GRAFT_BENCH_CPU_FACTOR (default 1.4) × that was externally disturbed; the
  * reported throughput per config is the MEDIAN of clean trials (falling
  * back to the highest-throughput trial, flagged `*_used_clean:false`, when
  * none are clean). /proc/loadavg and idle-sampled /proc/stat busy fractions
  * are recorded per trial as context but are NOT the filter — loadavg decays
  * too slowly after our own 32-core trials to separate us from co-tenants.
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
    * JVM is idle (between trials). Recorded as context alongside loadavg.
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
    def cpuPerTurn: Double = achievedCores * sec / turns
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

  /** Latest best-known output line; the shutdown hook prints it (exactly
    * once, racing main's final println via [[printed]]) if the JVM dies
    * before the run completes.
    */
  private val state = new AtomicReference[String](null)
  private val printed = new AtomicBoolean(false)

  private def emitFinal(json: String): Unit =
    if (printed.compareAndSet(false, true)) { println(json); System.out.flush() }

  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else f"$d%.3f"

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
    val budgetSec = sys.env.getOrElse("GRAFT_BENCH_BUDGET_SEC", "2400").toDouble
    val wall0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - wall0) / 1e9

    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val s = state.get()
      if (s != null) emitFinal(s)
    }))

    val skipQueries = sys.env.contains("GRAFT_BENCH_SKIP_QUERIES")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val trials = scala.collection.mutable.ArrayBuffer.empty[Trial]
    var truncated = false

    def failJson = failures.map(n => s""""$n"""").mkString("[", ",", "]")
    def queriesJson = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")

    val loCores = sys.env.getOrElse("GRAFT_BENCH_CORES_LOW", "8").toInt
    val hiCores = sys.env.getOrElse("GRAFT_BENCH_CORES_HIGH", "32").toInt
    val maxPairs = sys.env.getOrElse("GRAFT_BENCH_TRIALS", "3").toInt
    val cpuFactor = sys.env.getOrElse("GRAFT_BENCH_CPU_FACTOR", "1.4").toDouble

    /** Full output line from everything measured so far. */
    def render(partial: Boolean): String = {
      val scaling =
        if (trials.isEmpty)
          s"""{"n_conv":$nConv,"trials":[],"scaling_efficiency":null,"budget_truncated":$truncated}"""
        else {
          // clean rule is PER CONFIG: a trial is clean iff its CPU cost per
          // turn is within cpuFactor of the best trial AT THE SAME core
          // count. (A global best was wrong once the engine got fast enough
          // that the warm 32-core config pays genuinely more CPU/turn than
          // the warm 8-core config — coordination + memory contention — and
          // every hi trial was disqualified as "contaminated" against the lo
          // best. Cross-config weather still averages out via interleaving
          // and medians.)
          def pick(cores: Int): (Seq[Trial], Boolean) = {
            val ts = trials.filter(_.cores == cores).toSeq
            if (ts.isEmpty) return (Nil, false)
            val best = ts.map(_.cpuPerTurn).min
            val clean = ts.filter(_.cpuPerTurn <= cpuFactor * best)
            // no clean trial for this config ⇒ least-contaminated (highest
            // tput) trial, flagged false in the JSON
            if (clean.nonEmpty) (clean, true) else (Seq(ts.maxBy(_.tput)), false)
          }
          val bestCpuPerTurn = trials.map(_.cpuPerTurn).min
          val (lo, loClean) = pick(loCores)
          val (hi, hiClean) = pick(hiCores)
          val tputLo = median(lo.map(_.tput))
          val tputHi = median(hi.map(_.tput))
          val eff = (tputHi / tputLo) / (hiCores.toDouble / loCores)
          def repr(ts: Seq[Trial], m: Double): Seq[(String, Double)] =
            if (ts.isEmpty) Nil else ts.minBy(t => math.abs(t.tput - m)).stages
          def stagesJson(st: Seq[(String, Double)]): String =
            st.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
          val trialsJson = trials.map(t =>
            f"""{"cores":${t.cores},"sec":${t.sec}%.2f,"turns_per_sec":${t.tput}%.1f,""" +
              f""""loadavg":${t.load}%.2f,"ext_busy":${t.extBusy}%.3f,""" +
              f""""achieved_cores":${t.achievedCores}%.1f}""")
            .mkString("[", ",", "]")
          s"""{"n_conv":$nConv,"turns":${trials.head.turns},""" +
            s""""sec_8":${jnum(median(lo.map(_.sec)))},"sec_32":${jnum(median(hi.map(_.sec)))},""" +
            s""""turns_per_sec_8":${jnum(tputLo)},"turns_per_sec_32":${jnum(tputHi)},""" +
            s""""scaling_efficiency":${jnum(eff)},""" +
            s""""protocol":{"pairs_run":${trials.count(_.cores == loCores)},"interleaved":true,""" +
            f""""clean_rule":"cpu_per_turn<=${cpuFactor}%.1fx_best",""" +
            f""""best_cpu_us_per_turn":${bestCpuPerTurn * 1e6}%.1f,""" +
            s""""lo_used_clean":$loClean,"hi_used_clean":$hiClean,""" +
            s""""budget_truncated":$truncated,"trials":$trialsJson},""" +
            s""""stage_sec_8":${stagesJson(repr(lo, tputLo))},""" +
            s""""stage_sec_32":${stagesJson(repr(hi, tputHi))}}"""
        }
      val total = results.map(_._2).sum
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$queriesJson,""" +
        f""""query_failures":$failJson,"sf":"$sfDir","partial":$partial,""" +
        f""""budget_sec":$budgetSec%.0f,"elapsed_sec":$elapsed%.0f,""" +
        f""""pipeline_scaling":$scaling}"""
    }
    def checkpoint(): Unit = state.set(render(partial = true))

    checkpoint() // the hook has a (empty-but-valid) line even if killed early
    if (!skipQueries) {
      val spark = session(cpus)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // a crashing query must NOT masquerade as a normal timing row:
        // record it in query_failures (and rc) instead of swallowing
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failures += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        results += name -> (System.nanoTime() - t0) / 1e9
        checkpoint()
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // scaling evidence: identical pipeline job at N and 4N cores, run in
    // interleaved (lo, hi) pairs, budget-charged per pair; extra pairs past
    // maxPairs (≤2× cap) run while the budget allows and per-turn costs are
    // still converging (see stillImproving below)
    val hardCapPairs = maxPairs * 2
    if (elapsed < 0.4 * budgetSec)
      pipelineRun(hiCores, math.max(nConv / 10, 200)) // warmup: JIT/codegen/heap-touch
    var pair = 0
    // Extend past maxPairs while the measurement is still CONVERGING: if the
    // latest trial of either config set a new best per-turn CPU cost by >5%,
    // the JVM is still warming (JIT/code-cache effects persist across the
    // per-trial sessions — observed best cost falling 322→121 µs across 5
    // pairs) and a median taken now would mix cold and warm regimes.
    def stillImproving: Boolean =
      Seq(loCores, hiCores).exists { c =>
        val ts = trials.filter(_.cores == c).map(_.cpuPerTurn).toSeq
        ts.size >= 2 && ts.last <= 0.95 * ts.init.min
      }
    def wantMore: Boolean =
      pair < maxPairs || (pair < hardCapPairs && stillImproving)
    while (wantMore && !truncated) {
      val pairCost = // worst observed cost of a (lo, hi) pair so far
        if (trials.isEmpty) 0.0
        else trials.filter(_.cores == loCores).map(_.sec).max +
          trials.filter(_.cores == hiCores).map(_.sec).max
      // the first pair always runs — partial scaling evidence beats none
      if (pair > 0 && elapsed + pairCost > budgetSec) truncated = true
      else {
        trials += pipelineRun(loCores, nConv); checkpoint()
        trials += pipelineRun(hiCores, nConv); checkpoint()
        pair += 1
        if (elapsed > budgetSec) truncated = true
      }
    }

    emitFinal(render(partial = false))
    if (failures.nonEmpty) sys.exit(1)
  }
}
