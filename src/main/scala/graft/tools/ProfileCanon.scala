package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.operators.canon.{Canonicalize, ConnectedComponents}
import graft.operators.extract.Extract
import graft.operators.link.EntityLinker
import graft.sources.TranscriptGen

/** Profile the canon stage sub-steps. Usage: ProfileCanon [cores] [nConv] */
object ProfileCanon {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nConv = if (args.length > 1) args(1).toLong else 30000L
    val spark = graft.util.Sessions.local(cores, appName = "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val cfg = TranscriptGen.Config(nConv = nConv)
    val dict = TranscriptGen.aliasDictDs(spark, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val turns = time("gen+persist turns") {
      val t = TranscriptGen.turns(spark, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val triples = time("extract") {
      val t = Extract.triples(turns).persist(StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val linked = time("link") {
      val l = EntityLinker.link(triples, dict).persist(StorageLevel.MEMORY_AND_DISK)
      l.count(); l
    }
    val edges = time("aliasEdges distinct") {
      val e = Canonicalize.aliasEdges(linked, dict).persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    val comps = time("CC.run")(ConnectedComponents.run(edges))
    time("CC count")(comps.count())
    val names = time("idNames")(Canonicalize.idNames(linked, dict))
    val cmap = time("canonMap count") {
      val c = Canonicalize.canonMap(comps, names).persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    time("rewrite count")(Canonicalize.rewrite(linked, cmap).count())
    spark.stop()
  }
}
