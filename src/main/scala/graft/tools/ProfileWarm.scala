package graft.tools

import org.apache.spark.sql.functions._

/** Diagnose the warm per-execution cost of the kg pattern queries: with the
  * memoized graph hot, time progressively larger sub-plans of kg_match_2hop
  * so the fixed overhead (cache lookup / AQE rounds / broadcast builds) can
  * be attributed. Usage: ProfileWarm [sfDir] [cores]
  */
object ProfileWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.util.Sessions.local(cores, appName = "graft-profwarm")
    spark.sparkContext.setLogLevel("ERROR")

    // warm the memoized graph (first touch pays the pipeline)
    graft.SparkEntry.queries("kg_nodes")(spark, sfDir).count()
    graft.SparkEntry.queries("kg_match_2hop")(spark, sfDir).count()

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[warm] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }

    // raw cached scans
    val q = graft.SparkEntry.queries
    time("full kg_match_2hop")(q("kg_match_2hop")(spark, sfDir).count())

    // the same plan pieces, built directly against fresh parquet-free views
    val pmField = graft.SparkEntry.getClass.getDeclaredMethods
      .find(_.getName == "kgPattern")
    // use the public surface instead: rebuild from the cached graph the way
    // SparkEntry does
    val g = {
      val m = graft.SparkEntry.getClass.getDeclaredMethod("kgGraph",
        classOf[org.apache.spark.sql.SparkSession], classOf[String])
      m.setAccessible(true)
      m.invoke(graft.SparkEntry, spark, sfDir).asInstanceOf[graft.graph.GraphTables]
    }
    val pm = {
      val m = graft.SparkEntry.getClass.getDeclaredMethod("kgPattern",
        classOf[org.apache.spark.sql.SparkSession], classOf[String])
      m.setAccessible(true)
      m.invoke(graft.SparkEntry, spark, sfDir).asInstanceOf[graft.graph.PatternMatch]
    }

    time("nodes.count")(g.nodes.count())
    time("patternEdges.count")(pm.edges.count())
    time("scan(Customer).count")(pm.scan("n", Set("Customer")).count())
    time("1 expand")(pm.expand(pm.scan("n", Set("Customer")), "n", "a", Set("LIVES_IN")).count())
    time("2 expands") {
      val h1 = pm.expand(pm.scan("n", Set("Customer")), "n", "a", Set("LIVES_IN"))
      pm.expand(h1, "a", "b", Set("LOCATED_IN")).count()
    }
    time("2 expands + distinct") {
      val h1 = pm.expand(pm.scan("n", Set("Customer")), "n", "a", Set("LIVES_IN"))
      pm.expand(h1, "a", "b", Set("LOCATED_IN"))
        .select(col("n_name"), col("a_name"), col("b_name")).distinct().count()
    }

    // is it the wide analyzed tree under the cache boundary? materialize the
    // cached tables to fresh LOCAL checkpoints (shallow LogicalRDD leaves)
    // and run the identical query shape over those
    val nodesCk = g.nodes.localCheckpoint(true)
    val edgesCk = pm.edges.localCheckpoint(true)
    val pmCk = graft.graph.PatternMatch(nodesCk, edgesCk)
    time("ckpt: 2 expands + distinct") {
      val h1 = pmCk.expand(pmCk.scan("n", Set("Customer")), "n", "a", Set("LIVES_IN"))
      pmCk.expand(h1, "a", "b", Set("LOCATED_IN"))
        .select(col("n_name"), col("a_name"), col("b_name")).distinct().count()
    }

    spark.stop()
  }
}
