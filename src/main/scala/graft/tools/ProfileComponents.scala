package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.canon.ConnectedComponents
import graft.sources.TpchKg

/** Stage-by-stage timing of the kg_components query (mirrors the SparkEntry
  * entry). Usage: ProfileComponents [sfDir] [cores]
  */
object ProfileComponents {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val s = graft.util.Sessions.local(cores, appName = "graft-profcomp")
    s.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(s)
    // framework warmup
    s.read.parquet(s"$sfDir/nation.parquet").groupBy(col("n_regionkey")).count().count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[comp] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val ents = graft.util.TempCaches.track(
        TpchKg.entityNames(s, sfDir).select("name").distinct())
      time("ents materialize")(ents.count())
      val vars = ents.select(col("name"),
        explode(array(col("name"), lower(col("name")), upper(col("name")))).as("member"))
      val e1 = ents.select(GraftFunctions.fnv64(col("name")).as("src"),
        GraftFunctions.fnv64(lower(col("name"))).as("dst"))
      val e2 = ents.select(GraftFunctions.fnv64(lower(col("name"))).as("src"),
        GraftFunctions.fnv64(upper(col("name"))).as("dst"))
      val edges = e1.unionByName(e2).where(col("src") =!= col("dst"))
      val idName = graft.util.TempCaches.track(
        vars.select(GraftFunctions.fnv64(col("member")).as("id"), col("member")).distinct())
      time("idName materialize")(idName.count())
      val comp = time("cc run (eager rounds)")(ConnectedComponents.run(edges))
      val comps = time("withVertices count") {
        val c = idName.select("id").distinct()
          .join(comp, Seq("id"), "left_outer")
          .select(col("id"), coalesce(col("component"), col("id")).as("component"))
        c.count(); c
      }
      val member = graft.util.TempCaches.track(comps.join(idName, "id"))
      val canon = member.groupBy("component").agg(min("member").as("canon"))
      time("final join+distinct count") {
        member.join(canon, "component")
          .select(col("member"), col("canon")).distinct().count()
      }
      graft.util.TempCaches.release(s)
    }
    s.stop()
  }
}
