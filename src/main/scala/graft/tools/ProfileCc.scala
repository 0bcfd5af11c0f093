package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B variants of the CC round structure on the kg_components graph shape.
  * Usage: ProfileCc [sfDir] [cores]
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val s = graft.util.Sessions.local(cores, appName = "graft-profcc")
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    s.read.parquet(s"$sfDir/nation.parquet").groupBy(col("n_regionkey")).count().count()

    import graft.functions.GraftFunctions
    import graft.sources.TpchKg
    val ents = TpchKg.entityNames(s, sfDir).select("name").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ents.count()
    val e1 = ents.select(GraftFunctions.fnv64(col("name")).as("src"),
      GraftFunctions.fnv64(lower(col("name"))).as("dst"))
    val e2 = ents.select(GraftFunctions.fnv64(lower(col("name"))).as("src"),
      GraftFunctions.fnv64(upper(col("name"))).as("dst"))
    val edges0 = e1.unionByName(e2).where(col("src") =!= col("dst"))

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      sym.join(mins, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .where(col("src") =!= col("dst"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val directed = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val mins = directed.groupBy("src").agg(min(col("dst")).as("m"))
      directed.join(mins, "src")
        .select(explode(array(col("dst"), col("src"))).as("v"), col("m"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("src"), col("m").as("dst"))
        .distinct()
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc-ab] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val e = edges0.select(col("src").cast("long"), col("dst").cast("long"))
        .where(col("src") =!= col("dst")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("init sig")(e.agg(count(lit(1)), sum(xxhash64(col("src"), col("dst"))
        .cast("decimal(38,0)"))).head())
      // variant A: composed round (current shape)
      val a = time("A: composed round ckpt")(smallStar(largeStar(e)).localCheckpoint(true))
      time("A: sig")(a.agg(count(lit(1)), sum(xxhash64(col("src"), col("dst"))
        .cast("decimal(38,0)"))).head())
      // variant B: checkpoint largeStar mid-round
      val bl = time("B: largeStar ckpt")(largeStar(e).localCheckpoint(true))
      val b = time("B: smallStar ckpt")(smallStar(bl).localCheckpoint(true))
      time("B: sig")(b.agg(count(lit(1)), sum(xxhash64(col("src"), col("dst"))
        .cast("decimal(38,0)"))).head())
      e.unpersist(false)
      println()
    }
    s.stop()
  }
}
