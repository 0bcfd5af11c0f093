package graft.tools

import org.apache.spark.storage.StorageLevel

import graft.operators.canon.{Canonicalize, ConnectedComponents}
import graft.operators.extract.Extract
import graft.operators.link.EntityLinker
import graft.sources.TranscriptGen

/** Decompose the two pipeline stages whose scaling the bench flags (linked,
  * canon) into timed sub-steps under BENCH-TRUE conditions: pre-generated
  * corpus read in place, stage outputs materialized the way the bench's
  * `checkpoint=final` mode materializes them (eager localCheckpoint at
  * MEMORY_AND_DISK_SER + count).
  *
  * Usage: ProfileCanon [cores] [nConv] [corpusDir]
  *   corpusDir — parquet turns table (e.g. a `Bench` corpus dir); when
  *   absent the corpus is generated in this JVM first (excluded from timing).
  */
object ProfileCanon {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nConv = if (args.length > 1) args(1).toLong else 30000L
    val corpusDir = if (args.length > 2) Some(args(2)) else None
    val spark = graft.util.Sessions.local(cores, appName = s"graft-profile-$cores")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def time[T](label: String)(f: => T): T = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $cores%d $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (gc ${(gcMs - g0) / 1000.0}%.1f s)")
      r
    }
    // bench-mode stage materialization — same GRAFT_FINAL_MODE switch as
    // Pipeline's final-mode stage() so the A/B runs under identical shapes
    def stageMat(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val d = sys.env.getOrElse("GRAFT_FINAL_MODE", "ckpt_ser") match {
        case "persist" =>
          val p = df.persist(StorageLevel.MEMORY_AND_DISK); p.count(); p
        case "ckpt" => df.localCheckpoint(true)
        case _ => df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      }
      d.count()
      d
    }

    val cfg = TranscriptGen.Config(nConv = nConv)
    val dict = TranscriptGen.aliasDictDs(spark, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val turnsDf = corpusDir match {
      case Some(p) => spark.read.parquet(p)
      case None =>
        val dir = s"/tmp/graft-profile-corpus-$nConv"
        if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
          TranscriptGen.turns(spark, cfg).write.mode("overwrite").parquet(dir)
        }
        spark.read.parquet(dir)
    }
    time("turns count")(turnsDf.count())
    val turns = turnsDf.as[graft.model.Turn]

    // --- S2 triples, stage-true materialization ---
    val triples = time("triples (stage: ckpt_ser+count)")(stageMat(Extract.triples(turns).toDF()))
    val triplesDs = triples.as[graft.model.RawTriple]

    // --- S3 linked, decomposed ---
    time("  dict count")(dict.count())
    val t = triples
      .withColumn("s_norm", org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.trim(org.apache.spark.sql.functions.col("subj"))))
      .withColumn("o_norm", org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.trim(org.apache.spark.sql.functions.col("obj"))))
    time("  dict-join only (useLsh=false) count") {
      EntityLinker.link(triplesDs, dict, useLsh = false).count()
    }
    time("  miss-set distinct count") {
      import org.apache.spark.sql.functions._
      t.select(col("s_norm").as("norm")).unionByName(t.select(col("o_norm").as("norm")))
        .distinct()
        .join(org.apache.spark.sql.functions.broadcast(dict.select(col("alias").as("norm"))), Seq("norm"), "left_anti")
        .count()
    }
    time("  full link count (no materialize)") {
      EntityLinker.link(triplesDs, dict).count()
    }
    val linked = time("  linked (stage: ckpt_ser+count)") {
      stageMat(EntityLinker.link(triplesDs, dict).toDF())
    }
    val linkedDs = linked.as[graft.model.LinkedTriple]

    // --- S4 canon, decomposed ---
    import org.apache.spark.sql.functions._
    val sides = time("  sides distinct count") {
      val l = linked
      val s = l.select(col("subj_id").as("id"), col("subj_name").as("name"))
        .unionByName(l.select(col("obj_id").as("id"), col("obj_name").as("name")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val edges = sides.select(
      graft.functions.GraftFunctions.fnv64(lower(trim(col("name")))).as("src"), col("id").as("dst"))
    val comps = time("  CC runSeeded + count") {
      val c = ConnectedComponents.runSeeded(edges, Canonicalize.dictSeeds(dict))
        .persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val cmap = time("  canonMap count") {
      val names = sides.withColumn("is_dict", lit(false))
        .unionByName(dict.select(col("canonical_id").cast("long").as("id"), col("canonical_name").as("name")).withColumn("is_dict", lit(true)))
        .unionByName(dict.select(graft.functions.GraftFunctions.fnv64(col("alias")).as("id"), col("canonical_name").as("name")).withColumn("is_dict", lit(true)))
        .distinct()
      val c = Canonicalize.canonMap(comps, names).persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    time("  rewrite (stage: ckpt_ser+count)") {
      stageMat(Canonicalize.rewrite(linkedDs, cmap).toDF())
    }
    time("canon whole stage (prod path, ckpt_ser+count)") {
      stageMat(Canonicalize(linkedDs, dict).toDF())
    }
    spark.stop()
  }
}
