package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.canon.{Canonicalize, ConnectedComponents}
import graft.operators.extract.Extract
import graft.operators.link.EntityLinker
import graft.sources.TpchKg

/** Decompose the TpchKg canon stage (kgCached's dominant first-touch cost).
  * Usage: ProfileCanonKg [sfDir] [cores]
  */
object ProfileCanonKg {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.util.Sessions.local(cores, appName = "graft-prof-canonkg")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.read.parquet(s"$dir/nation.parquet").groupBy(col("n_regionkey")).count().count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[canonkg] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dict = TpchKg.dict(spark, dir)
    val linked = time("linked ckpt") {
      EntityLinker.link(Extract.triples(TpchKg.turns(spark, dir)), dict, useLsh = false)
        .toDF().localCheckpoint(true)
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val l = linked
      val sides = time("sides distinct mat") {
        val s = graft.util.TempCaches.track(
          l.select(col("subj_id").as("id"), col("subj_name").as("name"))
            .unionByName(l.select(col("obj_id").as("id"), col("obj_name").as("name")))
            .distinct())
        s.count(); s
      }
      val edges = sides.select(
        graft.functions.GraftFunctions.fnv64(lower(trim(col("name")))).as("src"),
        col("id").as("dst"))
      val comps = time("CC runSeeded eager+count") {
        val c = ConnectedComponents.runSeeded(edges, Canonicalize.dictSeeds(dict))
        c.count(); c
      }
      val cmap = time("canonMap mat") {
        val names = sides.withColumn("is_dict", lit(false))
          .unionByName(dict.select(col("canonical_id").cast("long").as("id"),
            col("canonical_name").as("name")).withColumn("is_dict", lit(true)))
          .unionByName(dict.select(graft.functions.GraftFunctions.fnv64(col("alias")).as("id"),
            col("canonical_name").as("name")).withColumn("is_dict", lit(true)))
        val c = graft.util.TempCaches.track(Canonicalize.canonMap(comps, names))
        c.count(); c
      }
      time("rewrite ckpt") {
        Canonicalize.rewrite(l.as[graft.model.LinkedTriple], cmap).toDF().localCheckpoint(true)
      }
      time("whole canon ckpt") {
        Canonicalize(l.as[graft.model.LinkedTriple], dict).toDF().localCheckpoint(true)
      }
      graft.util.TempCaches.release(spark)
    }
    spark.stop()
  }
}
