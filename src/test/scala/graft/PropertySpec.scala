package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.extract.{MentionDetector, TripleExtractor}
import graft.sources.TranscriptGen
import graft.util.Hashing

/** scalacheck property tests (FIXTURES.md test plan item d):
  * determinism/purity invariants of the non-Spark building blocks.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.oneOf("alpha", "beta", "Gamma", "DELTA", "x1", "y-2", "zeta")
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("extraction is a pure function of text (same input, same output)") {
    check(Prop.forAll(text) { t =>
      TripleExtractor.extract(t) == TripleExtractor.extract(t)
    })
  }

  test("extraction of template renders always yields the template's triple") {
    val ent = Gen.oneOf("Ada Lovelace", "Acme Corp", "Paris", "Nimbus Labs-7")
    check(Prop.forAll(ent, ent) { (s, o) =>
      val got = TripleExtractor.extract(s"$s works at $o.")
      got.size == 1 && got.head.subj == s && got.head.pred == "WORKS_AT" && got.head.obj == o
    })
  }

  test("norm is idempotent") {
    check(Prop.forAll(text) { t =>
      MentionDetector.norm(MentionDetector.norm(t)) == MentionDetector.norm(t)
    })
  }

  test("generator conversations are pure functions of (ordinal, config)") {
    val cfg = TranscriptGen.Config(nConv = 1000)
    check(Prop.forAll(Gen.choose(0L, 999L)) { o =>
      TranscriptGen.genConv(o, cfg) == TranscriptGen.genConv(o, cfg)
    })
  }

  test("every generated gold triple is recovered by the extractor (recall property)") {
    val cfg = TranscriptGen.Config(nConv = 500)
    check(Prop.forAll(Gen.choose(0L, 499L)) { o =>
      val (turns, gold) = TranscriptGen.genConv(o, cfg)
      val extracted = turns.flatMap(t =>
        TripleExtractor.extract(t.text).map(e => (t.conv_id, t.turn_idx, e.subj, e.pred, e.obj))).toSet
      gold.forall(g => extracted.contains((g.conv_id, g.turn_idx, g.subj, g.pred, g.obj)))
    })
  }

  test("entity synthesis is injective on canonical names (no vocab collisions)") {
    val n = 9999
    val names = (0 until n).map(i => TranscriptGen.entity(i).canonical)
    assert(names.distinct.size == n)
  }

  test("fnv64 has no collisions across the synthesized vocabulary") {
    val ids = (0 until 9999).flatMap(i => TranscriptGen.entity(i).aliases).distinct
      .map(Hashing.fnv64)
    assert(ids.distinct.size == ids.size)
  }
}
