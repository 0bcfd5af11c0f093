package graft.tools

import org.apache.spark.sql.SparkSession

import graft.plans.Pipeline
import graft.sources.TranscriptGen

/** A/B harness for the bench-mode stage materialization strategy.
  * Usage: StageBench <cores> <nConv> [reps] — runs the full pipeline
  * (checkpoint=final) `reps` times in this JVM, printing per-stage seconds.
  * Combine with GRAFT_FINAL_MODE=persist|ckpt|ckpt_ser.
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nConv = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 1
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def procCpuNs: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
    def psiTotalUs(kind: String): Long =
      scala.util.Try {
        val l = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(s"/proc/pressure/$kind")).get(0)
        "total=(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(-1L)
      }.getOrElse(-1L)

    (1 to reps).foreach { rep =>
      val dir = s"/tmp/graft-stagebench-$cores"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      val spark = graft.util.Sessions.local(cores, appName = s"stagebench-$cores")
      spark.sparkContext.setLogLevel("ERROR")
      val (gc0, cpu0, io0, cp0) = (gcMs, procCpuNs, psiTotalUs("io"), psiTotalUs("cpu"))
      val t0 = System.nanoTime()
      val r = Pipeline.run(spark, Pipeline.Config(dir,
        TranscriptGen.Config(nConv = nConv), checkpoint = "final"))
      val sec = (System.nanoTime() - t0) / 1e9
      val st = r.stages.map(s => f"${s.stage}=${s.wallMs / 1000.0}%.1f").mkString(" ")
      println(f"[stagebench] rep=$rep cores=$cores mode=${sys.env.getOrElse("GRAFT_FINAL_MODE", "ckpt_ser")} " +
        f"total=$sec%.1f gc_s=${(gcMs - gc0) / 1000.0}%.1f cpu_cores=${(procCpuNs - cpu0) / 1e9 / sec}%.1f " +
        f"psi_io_s=${(psiTotalUs("io") - io0) / 1e6}%.1f psi_cpu_s=${(psiTotalUs("cpu") - cp0) / 1e6}%.1f $st")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
