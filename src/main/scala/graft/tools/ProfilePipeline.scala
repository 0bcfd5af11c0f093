package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.plans.Pipeline
import graft.sources.TranscriptGen

/** One-off pipeline trials at an arbitrary (cores, nConv) under BENCH-TRUE
  * conditions (pre-generated corpus read in place, `checkpoint=final`,
  * tmpfs scratch, 16 MB read bins) — for scale-point profiling the budgeted
  * bench can't afford, e.g. re-measuring the nodes stage at the 26 M-turn
  * corpus where round 4 caught it superlinear (3× data, 9× time;
  * `BENCH_r04.json` stage_sec_8 nodes=380.5 s vs 42.2 s at 8.6 M turns).
  *
  * Usage: ProfilePipeline [cores] [nConv] [trials]
  * Prints per-trial stage seconds + turns/s; first trial is the JVM warmup —
  * read the later ones.
  */
object ProfilePipeline {
  private val root: String =
    sys.env.get("GRAFT_BENCH_DIR").getOrElse {
      if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm/graft-profile"
      else System.getProperty("java.io.tmpdir")
    }

  private def rmrf(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
  }

  private def session(cores: Int): SparkSession = {
    val s = graft.util.Sessions.local(cores, appName = s"graft-profpipe-$cores",
      localDir = Some(s"$root/spill"))
    s.conf.set("spark.sql.files.maxPartitionBytes", "16m") // bench parity
    s
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nConv = if (args.length > 1) args(1).toLong else 1200000L
    val trials = if (args.length > 2) args(2).toInt else 2

    val corpusDir = s"$root/corpus-$nConv"
    if (!Files.exists(Paths.get(corpusDir))) {
      val gen = session(32)
      gen.sparkContext.setLogLevel("ERROR")
      val t0 = System.nanoTime()
      TranscriptGen.turns(gen, TranscriptGen.Config(nConv = nConv)).write.parquet(corpusDir)
      println(f"[profpipe] corpus $nConv%d conv generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      gen.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    for (t <- 1 to trials) {
      val work = s"$root/work-$cores-$nConv"
      rmrf(work)
      val spark = session(cores)
      spark.sparkContext.setLogLevel("ERROR")
      val t0 = System.nanoTime()
      val r = Pipeline.run(spark, Pipeline.Config(work,
        TranscriptGen.Config(nConv = nConv), checkpoint = "final",
        transcriptsPath = Some(corpusDir), inputOrdered = true))
      val sec = (System.nanoTime() - t0) / 1e9
      val stages = r.stages.map(s => f"${s.stage}=${s.wallMs / 1000.0}%.1f").mkString(" ")
      println(f"[profpipe] trial $t cores=$cores conv=$nConv turns=${r.turns} " +
        f"sec=$sec%.1f turns/s=${r.turns / sec}%.0f | $stages")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      rmrf(work)
      System.gc()
      Thread.sleep(2000)
    }
    rmrf(corpusDir)
  }
}
