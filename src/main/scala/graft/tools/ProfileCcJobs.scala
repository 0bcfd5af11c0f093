package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-job timing of ConnectedComponents.run's internal steps on the
  * kg_components graph shape (mirrors run()'s structure with stopwatches —
  * measurement only). Usage: ProfileCcJobs [sfDir] [cores]
  */
object ProfileCcJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val s = graft.util.Sessions.local(cores, appName = "graft-profccjobs")
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    s.read.parquet(s"$sfDir/nation.parquet").groupBy(col("n_regionkey")).count().count()

    import graft.functions.GraftFunctions
    import graft.sources.TpchKg

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccj] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

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

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val ents = TpchKg.entityNames(s, sfDir).select("name").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      ents.count()
      val e1 = ents.select(GraftFunctions.fnv64(col("name")).as("src"),
        GraftFunctions.fnv64(lower(col("name"))).as("dst"))
      val e2 = ents.select(GraftFunctions.fnv64(lower(col("name"))).as("src"),
        GraftFunctions.fnv64(upper(col("name"))).as("dst"))
      val edges0 = e1.unionByName(e2).where(col("src") =!= col("dst"))

      var e = time("init distinct+persist") {
        val d = edges0.select(col("src").cast("long"), col("dst").cast("long"))
          .where(col("src") =!= col("dst"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count()
        d
      }
      val sig0 = time("pre-loop signature") {
        e.agg(count(lit(1)), sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
      }
      val ls = time("largeStar persist (lazy)") {
        largeStar(e).persist(StorageLevel.MEMORY_AND_DISK)
      }
      val next = time("smallStar checkpoint") { smallStar(ls).localCheckpoint(true) }
      time("ls unpersist") { ls.unpersist(false) }
      val sig1 = time("round signature") {
        next.agg(count(lit(1)), sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
      }
      val starAgg = time("star agg (n, countDistinct src)") {
        next.agg(count(lit(1)), countDistinct(col("src"))).head()
      }
      val semiEmpty = time("star semi-join isEmpty") {
        next.join(next.select(col("src").as("dst")).distinct(), Seq("dst"), "left_semi").isEmpty
      }
      val combined = time("combined agg (n, cd, hash)") {
        next.agg(count(lit(1)), countDistinct(col("src")),
          sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
      }
      val tail = time("tail union groupBy min") {
        val stars = next.select(col("src").as("id"), col("dst").as("component"))
        val roots = next.select(col("dst").as("id")).distinct()
          .withColumn("component", col("id"))
        stars.unionByName(roots).groupBy("id").agg(min("component").as("component")).count()
      }
      println(s"[ccj] sig0=$sig0 sig1=$sig1 star=$starAgg semiEmpty=$semiEmpty tail=$tail")
      e.unpersist(false)
      ents.unpersist(false)
      graft.util.TempCaches.release(s)
    }
    s.stop()
  }
}
