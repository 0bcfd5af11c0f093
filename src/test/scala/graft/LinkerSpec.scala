package graft

import graft.model.{AliasEntry, RawTriple}
import graft.operators.link.EntityLinker

class LinkerSpec extends SparkTestBase {
  import spark.implicits._

  private val dictEntries = Seq(
    AliasEntry("ada lovelace", graft.util.Hashing.fnv64("Ada Lovelace"), "Ada Lovelace", "Person"),
    AliasEntry("a lovelace", graft.util.Hashing.fnv64("Ada Lovelace"), "Ada Lovelace", "Person"),
    AliasEntry("acme corp", graft.util.Hashing.fnv64("Acme Corp"), "Acme Corp", "Org"),
    AliasEntry("paris", graft.util.Hashing.fnv64("Paris"), "Paris", "Place"))
  private lazy val dict = EntityLinker.dictionary(spark, dictEntries)

  test("dictionary path links exact and case-variant surfaces") {
    val triples = Seq(
      RawTriple("c1", 0, 0, "Ada Lovelace", "WORKS_AT", "Acme Corp"),
      RawTriple("c1", 1, 0, "ADA LOVELACE", "LIVES_IN", "Paris")).toDS()
    val linked = EntityLinker.link(triples, dict, useLsh = false).collect()
    assert(linked.length == 2)
    val byTurn = linked.map(l => l.turn_idx -> l).toMap
    assert(byTurn(0).subj_name == "Ada Lovelace" && byTurn(0).obj_name == "Acme Corp")
    assert(byTurn(0).link_method == "dict/dict")
    assert(byTurn(1).subj_id == graft.util.Hashing.fnv64("Ada Lovelace"))
  }

  test("LSH path links typo surfaces missed by the dictionary") {
    val triples = Seq(
      RawTriple("c2", 0, 0, "Ada Lovelce", "WORKS_AT", "Acme Crop")).toDS()
    val linked = EntityLinker.link(triples, dict, useLsh = true).collect()
    assert(linked.length == 1)
    assert(linked.head.subj_name == "Ada Lovelace", linked.head)
    assert(linked.head.obj_name == "Acme Corp", linked.head)
    assert(linked.head.link_method == "lsh/lsh")
  }

  test("unknown surfaces fall back to stable surface ids") {
    val triples = Seq(
      RawTriple("c3", 0, 0, "Zorblax Prime", "LIVES_IN", "Paris"),
      RawTriple("c3", 1, 0, "zorblax prime", "MOVED_TO", "Paris")).toDS()
    val linked = EntityLinker.link(triples, dict, useLsh = false).collect()
    val ids = linked.map(_.subj_id).distinct
    assert(ids.length == 1, "same unknown surface must get the same id")
    assert(ids.head == graft.util.Hashing.fnv64("zorblax prime"))
    assert(linked.forall(_.link_method.startsWith("surface/")))
  }

  test("lshLink never plans a driver-built broadcast (pinned shuffle joins)") {
    // Round-5 scaling fix: every LSH-internal join is vocabulary-sized on
    // both sides, and broadcasting the ×NumBands banded index cost a ~15 s
    // single-threaded driver hash-build per pipeline run (the linked
    // stage's non-scaling Amdahl term). The shuffle_hash hints must keep
    // BroadcastExchange out of the physical plan even as Catalyst's size
    // estimates or defaults change.
    val queries = Seq("ada lovelce", "acme crop").toDF("norm")
    val plan = EntityLinker.lshLink(queries, dict).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"lshLink plan regressed to a broadcast join:\n$plan")
  }

  test("minhash LSH candidates contain all true high-jaccard pairs (recall)") {
    // brute-force jaccard >= threshold pairs on a small vocab must all be
    // found by the banded signature join
    val vocab = Seq("ada lovelace", "ada lovelce", "alan turing", "aln turing",
      "grace hopper", "acme corp", "acme crop", "globex labs")
    val queries = vocab.toDF("norm")
    val d = dictEntries
    val got = EntityLinker.lshLink(queries, dict).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("ada lovelce") == "Ada Lovelace")
    assert(got("acme crop") == "Acme Corp")
    assert(!got.contains("globex labs"))
  }
}
