package graft

import java.nio.file.{Files, Paths}

import graft.graph.PatternMatch
import graft.sources.EdgeListSource

/** Port of the reference benchmark's loader + query
  * (apps/Benchmark.scala:24-30): TSV edge list → Page/LINKS graph,
  * `MATCH (n)-->(m) RETURN n`.
  */
class EdgeListSpec extends SparkTestBase {

  test("TSV edge list loads with derived nodes and supports the benchmark query") {
    val dir = tmpDir("graft-tsv")
    Files.write(Paths.get(dir, "edges.tsv"),
      ("# FromNodeId\tToNodeId\n" +
        "0\t1\n0\t2\n1\t2\n2\t0\n3\t0\n").getBytes)
    val g = EdgeListSource.read(spark, s"$dir/edges.tsv")
    assert(g.nodes.count() == 4)
    assert(g.edges.count() == 5)
    val pm = PatternMatch(g.nodes, g.edges)
    // MATCH (n)-->(m) RETURN n — bag semantics, one row per edge
    val res = pm.expand(pm.scan("n", Set("Page")), "n", "m").select("n_id")
    assert(res.count() == 5)
    // deterministic content-derived edge ids (no zipWithIndex)
    val ids1 = g.edges.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val g2 = EdgeListSource.read(spark, s"$dir/edges.tsv")
    val ids2 = g2.edges.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }
}
