package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

import graft.operators.canon.Canonicalize
import graft.operators.extract.Extract
import graft.operators.link.EntityLinker
import graft.sources.TpchKg

/** Decompose `SparkEntry.kgCached`'s one-time graph build (the cost the
  * first kg_* query to touch the cache pays — kg_cypher in the sweep) into
  * timed sub-steps at a given sf dir.
  *
  * Usage: ProfileKgGraph [sfDir] [cores]
  */
object ProfileKgGraph {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.util.Sessions.local(cores, appName = "graft-prof-kg")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profkg] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val turns = time("transcripts+turns count") {
      val t = TpchKg.turns(spark, dir).persist(MEMORY_AND_DISK)
      t.count(); t
    }
    val dict = TpchKg.dict(spark, dir)
    time("dict count")(dict.count())
    val triples = time("extract triples") {
      val t = Extract.triples(turns).persist(MEMORY_AND_DISK); t.count(); t
    }
    val linked = time("link (useLsh=false)") {
      val l = EntityLinker.link(triples, dict, useLsh = false).persist(MEMORY_AND_DISK)
      l.count(); l
    }
    val canon = time("canonicalize (CC)") {
      val c = Canonicalize(linked, dict).persist(MEMORY_AND_DISK); c.count(); c
    }
    val types = dict.select(col("canonical_name").as("canon_name"), col("entity_type")).distinct()
    val g = graft.graph.Materialize.graph(canon, Some(types))
    val edges = time("materialize edges") {
      val e = g.edges.persist(MEMORY_AND_DISK); e.count(); e
    }
    time("materialize nodes") {
      val n = g.nodes.persist(MEMORY_AND_DISK); n.count(); n
    }
    time("pattern edges distinct") {
      edges.select(col("src"), col("dst"), col("rel_type")).distinct().count()
    }
    spark.stop()
  }
}
