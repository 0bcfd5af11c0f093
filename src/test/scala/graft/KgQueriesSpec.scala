package graft

import org.apache.spark.sql.functions._

/** Pre-driver smoke of the full SparkEntry contract at sf0.001: every query
  * runs and returns rows; a handful of hand-computed invariants guard the
  * oracle-facing semantics (the DuckDB value-compare itself is the driver's
  * job, mirrored locally by tools/check_oracle.py).
  */
class KgQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every SparkEntry query runs and returns rows at sf0.001") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, dir).count()
    }
    val empty = counts.filter(_._2 == 0)
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("every query key has an oracle or is a documented rows-only check") {
    val rowsOnly = Set("dd_minhash_lsh", "dd_simhash", "dd_embed_neardup",
      "sim_ann_lsh", "ta_fingerprint", // mm_decode gained a real oracle in round 2
      // round 3: uncapped full-table dedup sweeps — the O(n²) DuckDB shingle
      // oracle can't follow; the capped entries above stay hash-gated
      "dd_minhash_full", "dd_simhash_full",
      // round 5: IVF ANN — trained centroids are float-mean artifacts DuckDB
      // can't reproduce; recall vs bruteTopK is the OpsSpec gate
      "sim_ann_ivf")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or rows-only waiver: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("kg invariants: 4 turns per conversation, per-turn text equality round-trips") {
    val t = SparkEntry.queries("kg_transcripts")(spark, dir)
    val perConv = t.groupBy("conv_id").count().select("count").distinct().collect()
    assert(perConv.map(_.getLong(0)).toSeq == Seq(4L))
    // triples: exactly 3 per conversation (turns 1..3), extracted from text alone
    val tr = SparkEntry.queries("kg_triples")(spark, dir)
    assert(tr.count() == t.select("conv_id").distinct().count() * 3)
  }

  test("kg_linked resolves every surface to a dictionary canonical (no 'surface' fallbacks)") {
    import spark.implicits._
    val linked = graft.operators.link.EntityLinker.link(
      graft.operators.extract.Extract.triples(graft.sources.TpchKg.turns(spark, dir)),
      graft.sources.TpchKg.dict(spark, dir), useLsh = false)
    val methods = linked.select("link_method").distinct().as[String].collect().toSet
    assert(methods == Set("dict/dict"), methods)
  }

  test("entry() (flagship) returns the full edge list") {
    val e = SparkEntry.entry(spark)
    assert(e.count() > 0)
    assert(e.columns.toSet ==
      Set("conv_id", "turn_idx", "src_name", "rel_type", "dst_name"))
  }
}
