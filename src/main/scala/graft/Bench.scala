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
  * host load hits both configs alike. Admissibility (round-4 rules):
  *  1. a trial with achieved_cores > 1.1 × requested is DISQUALIFIED outright
  *     (the JVM cannot legitimately out-achieve its core budget — overshoot
  *     means process-CPU accounting was polluted under external contention);
  *  2. among qualified trials, clean-per-config: CPU cost per turn (achieved
  *     cores × wall / turns) ≤ GRAFT_BENCH_CPU_FACTOR (default 1.4) × the
  *     config's best qualified cost — meaningful only with ≥2 qualified
  *     trials (one trial is trivially within any factor of itself);
  *  3. `scaling_efficiency` prints null unless both configs pass (2); the
  *     raw ratio is always visible as `scaling_efficiency_raw`;
  *  4. `measurement_valid` is true only with ≥2 CLEAN trials per config and
  *     a physically plausible efficiency (≤ 1.15). The pair loop keeps
  *     scheduling (to a 2× hard cap) until this holds or the budget runs out,
  *     and pairs are budget-admitted at the MINIMUM observed pair cost so a
  *     contaminated slow trial can't block its own retry.
  * Reported throughput per config is the MEDIAN of clean trials (fallback:
  * highest-throughput qualified trial, flagged `*_used_clean:false`).
  * /proc/loadavg and idle-sampled /proc/stat busy fractions are recorded per
  * trial as context but are NOT the filter — loadavg decays too slowly after
  * our own 32-core trials to separate us from co-tenants.
  */
object Bench {

  /** Scratch root for trial workdirs and shuffle spill: tmpfs when the host
    * has one (GRAFT_BENCH_DIR overrides). On a real cluster, snapshot-write
    * and spill bandwidth scale with the executor count; on a single box the
    * one disk does NOT scale with cores, so leaving trial I/O on it folds a
    * constant disk-bandwidth term into both configs and deflates the
    * CPU-scaling signal the two-parallelism proxy is meant to measure
    * (observed: the edges stage pinned at ~22 s at BOTH local[8] and
    * local[32] — pure parquet write to /tmp on the shared virtual disk).
    */
  private val benchRoot: String = sys.env.get("GRAFT_BENCH_DIR").getOrElse {
    if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm/graft-bench"
    else System.getProperty("java.io.tmpdir")
  }

  private def session(cores: Int): SparkSession = {
    val s = graft.util.Sessions.local(cores, appName = s"graft-bench-$cores",
      localDir = Some(s"$benchRoot/spill"))
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
    /** Hard disqualifier: the JVM cannot legitimately achieve more cores than
      * it requested — overshoot means the process-CPU accounting was polluted
      * by GC/JIT threads thrashing under external contention (observed:
      * achieved 10.9 on a local[8] trial under loadavg 26). 1.1 allows normal
      * GC/JIT overhead. A disqualified trial is recorded in the JSON but
      * excluded from medians, the clean rule, and the efficiency.
      */
    def disqualified: Boolean = achievedCores > 1.1 * cores
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
    val dir = s"$benchRoot/graft-bench-$cores-$nConv"
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
    // corpus sizing: GRAFT_BENCH_CONV is the CEILING the sweep may use, not a
    // commitment — the proxy only reflects real parallel scaling when
    // per-stage work dwarfs per-stage fixed overhead, which wants the corpus
    // large (1.2M conversations ≈ 26M turns for the round-4 engine), but
    // round 4 committed to that corpus without checking it fit the budget:
    // one cold 1,466 s 8-core trial consumed everything and the 32-core
    // trial died at the driver's hard timeout — four rounds with no
    // admissible scaling artifact. Round-5 rule: after the warmups measure
    // actual throughput at both configs, [[nConv]] is re-derived as the
    // largest corpus ≤ the ceiling whose trial PAIR fits the remaining
    // budget TWICE (2 clean pairs = the admissibility bar), floored at
    // GRAFT_BENCH_CONV_FLOOR (the work ≫ overhead threshold — below it the
    // efficiency number is valid but meaningless).
    val nConvReq = sys.env.getOrElse("GRAFT_BENCH_CONV", "1200000").toLong
    val nConvFloor = sys.env.getOrElse("GRAFT_BENCH_CONV_FLOOR", "600000").toLong
    var nConv = nConvReq
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

    // ---- admissibility (round-4 protocol) --------------------------------
    // A config's trials are first QUALIFIED (achieved_cores ≤ 1.1 × requested
    // — Trial.disqualified drops CPU-accounting-polluted trials entirely),
    // then the clean rule applies PER CONFIG among qualified trials: clean
    // iff CPU cost per turn ≤ cpuFactor × the config's best qualified cost.
    // (Per-config because the warm 32-core config legitimately pays more
    // CPU/turn than the 8-core config — coordination + memory contention.)
    // The clean rule is only meaningful with ≥2 qualified trials (one trial
    // is trivially within any factor of itself — the round-3 hole), so:
    //  - scaling_efficiency is null unless BOTH configs have ≥2 qualified
    //    trials and ≥1 clean trial;
    //  - measurement_valid is true only when both configs have ≥2 CLEAN
    //    trials and the efficiency is physically plausible (≤ 1.15).
    final case class Pick(used: Seq[Trial], usedClean: Boolean,
        nClean: Int, nQualified: Int)
    def pick(cores: Int): Pick = {
      val qualified = trials.filter(t => t.cores == cores && !t.disqualified).toSeq
      if (qualified.isEmpty) return Pick(Nil, usedClean = false, 0, 0)
      val best = qualified.map(_.cpuPerTurn).min
      val clean = qualified.filter(_.cpuPerTurn <= cpuFactor * best)
      val meaningful = qualified.size >= 2 && clean.nonEmpty
      if (meaningful) Pick(clean, usedClean = true, clean.size, qualified.size)
      else Pick(Seq(qualified.maxBy(_.tput)), usedClean = false, clean.size, qualified.size)
    }
    def measurementValid: Boolean = {
      val (lo, hi) = (pick(loCores), pick(hiCores))
      if (lo.nClean < 2 || hi.nClean < 2 || !lo.usedClean || !hi.usedClean) false
      else {
        val eff = (median(hi.used.map(_.tput)) / median(lo.used.map(_.tput))) /
          (hiCores.toDouble / loCores)
        eff > 0 && eff <= 1.15
      }
    }

    /** Full output line from everything measured so far. */
    def render(partial: Boolean): String = {
      val scaling =
        if (trials.isEmpty)
          s"""{"n_conv":$nConv,"n_conv_requested":$nConvReq,"n_conv_floor":$nConvFloor,""" +
            s""""trials":[],"scaling_efficiency":null,""" +
            s""""measurement_valid":false,"budget_truncated":$truncated}"""
        else {
          val qualifiedAll = trials.filterNot(_.disqualified)
          val bestCpuPerTurn =
            if (qualifiedAll.isEmpty) Double.NaN else qualifiedAll.map(_.cpuPerTurn).min
          val lo = pick(loCores)
          val hi = pick(hiCores)
          val tputLo = median(lo.used.map(_.tput))
          val tputHi = median(hi.used.map(_.tput))
          val effRaw = (tputHi / tputLo) / (hiCores.toDouble / loCores)
          // admissible efficiency: both configs must have ≥2 qualified trials
          // and a clean representative — otherwise null (the r3 1.320 came
          // from a single contaminated pair the vacuous rule called clean)
          val effAdmissible = lo.usedClean && hi.usedClean
          val effJson = if (effAdmissible) jnum(effRaw) else "null"
          val valid = measurementValid
          def repr(ts: Seq[Trial], m: Double): Seq[(String, Double)] =
            if (ts.isEmpty) Nil else ts.minBy(t => math.abs(t.tput - m)).stages
          def stagesJson(st: Seq[(String, Double)]): String =
            st.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
          val trialsJson = trials.map(t =>
            f"""{"cores":${t.cores},"sec":${t.sec}%.2f,"turns_per_sec":${t.tput}%.1f,""" +
              f""""loadavg":${t.load}%.2f,"ext_busy":${t.extBusy}%.3f,""" +
              f""""achieved_cores":${t.achievedCores}%.1f,""" +
              s""""disqualified":${t.disqualified}}""")
            .mkString("[", ",", "]")
          s"""{"n_conv":$nConv,"n_conv_requested":$nConvReq,"n_conv_floor":$nConvFloor,""" +
            s""""turns":${trials.head.turns},""" +
            s""""sec_8":${jnum(median(lo.used.map(_.sec)))},"sec_32":${jnum(median(hi.used.map(_.sec)))},""" +
            s""""turns_per_sec_8":${jnum(tputLo)},"turns_per_sec_32":${jnum(tputHi)},""" +
            s""""scaling_efficiency":$effJson,""" +
            s""""scaling_efficiency_raw":${jnum(effRaw)},""" +
            s""""measurement_valid":$valid,""" +
            s""""protocol":{"pairs_run":${trials.count(_.cores == loCores)},"interleaved":true,""" +
            f""""clean_rule":"cpu_per_turn<=${cpuFactor}%.1fx_best_qualified;>=2_qualified;achieved<=1.1x_requested",""" +
            f""""best_cpu_us_per_turn":${bestCpuPerTurn * 1e6}%.1f,""" +
            s""""lo_used_clean":${lo.usedClean},"hi_used_clean":${hi.usedClean},""" +
            s""""lo_clean_trials":${lo.nClean},"hi_clean_trials":${hi.nClean},""" +
            s""""lo_qualified_trials":${lo.nQualified},"hi_qualified_trials":${hi.nQualified},""" +
            s""""budget_truncated":$truncated,"trials":$trialsJson},""" +
            s""""stage_sec_8":${stagesJson(repr(lo.used, tputLo))},""" +
            s""""stage_sec_32":${stagesJson(repr(hi.used, tputHi))}}"""
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
        // per-query persisted intermediates (LSH signature/vector tables)
        // are released between queries so a 50-query sweep doesn't
        // accumulate cached tables; the memoized graph is NOT tracked here
        // and intentionally survives across the kg_* queries
        graft.util.TempCaches.release(spark)
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
    // ESCALATING warmups before the first measured pair. C2 keeps compiling
    // across trials (per-trial sessions share the JVM) and needs SEVERAL
    // full pipeline passes to reach steady state — round 3 measured best
    // per-turn CPU falling 322→121 µs across 5 pairs, and round 4's single
    // nConv/5 warmup left the first full trial 4× cold, which is what ate
    // the budget. A ladder of (hi, lo) pairs at nConvReq/40 → /16 → /8
    // warms both configs at a fraction of a full trial's cost; later rungs
    // are skipped once the best per-turn CPU stops improving >10% (JIT
    // converged) or the warmup share of the budget (35%) is spent. The last
    // rung doubles as the THROUGHPUT PROBE that budget-fits the measured
    // corpus. Per-conv cost GROWS with corpus (GC/spill pressure): the two
    // r5 dress rehearsals measured full-corpus pairs at 1.45× and 1.79× the
    // warm-rung estimate, so the fit plans THREE pair-slots (2 clean pairs =
    // the admissibility bar, +1 slot so a weather-contaminated trial can be
    // retried instead of invalidating the artifact) at 1.7 safety. Rehearsal
    // #2 fit 2 slots at 1.6 and chose 1.06M conv — the measured pair cost
    // (431 s hi + ~650 s lo) could not fit twice in the 1935 s remaining.
    val margin = 60.0
    var warmFit: Option[Double] = None // sec per conv for one (hi+lo) pair
    val rungs = Seq(40L, 16L, 8L).map(d => math.max(nConvReq / d, 200L)).distinct
    var bestCost = Double.MaxValue
    var keepWarming = true
    for (wc <- rungs if keepWarming && elapsed < 0.35 * budgetSec) {
      val wh = pipelineRun(hiCores, wc)
      val wl = pipelineRun(loCores, wc)
      warmFit = Some((wh.sec + wl.sec) / wc)
      val c = math.min(wh.cpuPerTurn, wl.cpuPerTurn)
      System.err.println(f"[bench] warmup@$wc%d conv: hi ${wh.sec}%.1fs lo ${wl.sec}%.1fs " +
        f"best_cpu ${c * 1e6}%.0f µs/turn (prev best ${if (bestCost == Double.MaxValue) -1 else bestCost * 1e6}%.0f)")
      if (c > 0.9 * bestCost) keepWarming = false // converged — stop escalating
      bestCost = math.min(bestCost, c)
    }
    nConv = warmFit match {
      case Some(pairSecPerConv) if pairSecPerConv > 0 =>
        val rem = budgetSec - elapsed - margin
        val fit2 = (rem / 3.0 / (1.7 * pairSecPerConv)).toLong
        val chosen = math.max(math.min(nConvReq, fit2), math.min(nConvFloor, nConvReq))
        System.err.println(f"[bench] corpus fit $fit2%d → using $chosen%d " +
          f"(ceiling $nConvReq%d, floor $nConvFloor%d, rem ${rem}%.0fs)")
        chosen
      // no time to probe throughput — take the floor, never the ceiling
      case _ => math.min(nConvFloor, nConvReq)
    }
    var pair = 0
    // Extend past maxPairs while the measurement is still CONVERGING: if the
    // latest qualified trial of either config set a new best per-turn CPU
    // cost by >5%, the JVM is still warming (JIT/code-cache effects persist
    // across the per-trial sessions — observed best cost falling 322→121 µs
    // across 5 pairs) and a median taken now would mix cold and warm regimes.
    def stillImproving: Boolean =
      Seq(loCores, hiCores).exists { c =>
        val ts = trials.filter(t => t.cores == c && !t.disqualified).map(_.cpuPerTurn).toSeq
        ts.size >= 2 && ts.last <= 0.95 * ts.init.min
      }
    // keep scheduling pairs (up to the 2× hard cap) until BOTH configs have
    // ≥2 clean trials — the admissibility bar — so one weather-contaminated
    // trial buys a retry instead of poisoning the reported efficiency
    def wantMore: Boolean =
      pair < maxPairs ||
        (pair < hardCapPairs && (stillImproving || !measurementValid))
    while (wantMore && !truncated) {
      // budget on the MINIMUM observed pair cost: the cheapest-possible next
      // pair is the right admission question — charging the worst pair let a
      // single contaminated 1,125 s trial block the retry that would have
      // produced the clean evidence (round-3 defect)
      val pairCost =
        if (trials.isEmpty) 0.0
        else trials.filter(_.cores == loCores).map(_.sec).min +
          trials.filter(_.cores == hiCores).map(_.sec).min
      // the first pair always runs — partial scaling evidence beats none.
      // HI config runs first within each pair (round-4 lesson: the 32-core
      // trial is ~5× cheaper wall-clock, so a budget overrun mid-pair still
      // leaves ≥1 complete trial — and a stage profile — at EACH parallelism
      // instead of only the 8-core side)
      if (pair > 0 && elapsed + pairCost > budgetSec) truncated = true
      else {
        trials += pipelineRun(hiCores, nConv); checkpoint()
        trials += pipelineRun(loCores, nConv); checkpoint()
        pair += 1
        if (elapsed > budgetSec) truncated = true
      }
    }

    emitFinal(render(partial = false))
    if (failures.nonEmpty) sys.exit(1)
  }
}
