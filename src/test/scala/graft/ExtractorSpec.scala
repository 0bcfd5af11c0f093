package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.extract.{MentionDetector, TripleExtractor}
import graft.sources.TranscriptGen

/** Pure (no-Spark) tests of the frozen extraction spec, including the
  * P/R ≥ 0.95 gate against generator gold labels (BASELINE.md metric 1) —
  * extraction and generation are both pure functions, so the gate runs
  * driver-side over a deterministic corpus.
  */
class ExtractorSpec extends AnyFunSuite {

  test("single-pattern sentences extract exactly one triple each") {
    val cases = Seq(
      ("Ada Lovelace works at Acme Corp.", ("Ada Lovelace", "WORKS_AT", "Acme Corp")),
      ("Globex Corp was founded by Alan Turing in 1912.", ("Globex Corp", "FOUNDED_BY", "Alan Turing")),
      ("Grace Hopper lives in Paris.", ("Grace Hopper", "LIVES_IN", "Paris")),
      ("Initech Labs is located in Berlin.", ("Initech Labs", "LOCATED_IN", "Berlin")),
      ("Acme Corp is based in Tokyo.", ("Acme Corp", "BASED_IN", "Tokyo")),
      ("I asked Donald Knuth about Oslo.", ("Donald Knuth", "ASKED_ABOUT", "Oslo")),
      ("Paris is the capital of France.", ("Paris", "CAPITAL_OF", "France")),
      ("Ken Thompson reports to Dennis Ritchie.", ("Ken Thompson", "REPORTS_TO", "Dennis Ritchie")))
    for ((text, (s, p, o)) <- cases) {
      val got = TripleExtractor.extract(text)
      assert(got.size == 1, s"text: $text got: $got")
      assert((got.head.subj, got.head.pred, got.head.obj) == ((s, p, o)), s"text: $text")
    }
  }

  test("multi-sentence turns extract per sentence with stable sent_idx") {
    val got = TripleExtractor.extract(
      "please run the query again. Ada Lovelace works at Acme Corp. Paris is the capital of France.")
    assert(got.map(e => (e.sentIdx, e.pred)) == Seq((1, "WORKS_AT"), (2, "CAPITAL_OF")))
  }

  test("distractors extract nothing") {
    for (d <- Seq("the weather was pleasant yesterday.", "here are the results you requested."))
      assert(TripleExtractor.extract(d).isEmpty, d)
  }

  test("generator is deterministic and splittable") {
    val cfg = TranscriptGen.Config(nConv = 10)
    val (t1, g1) = TranscriptGen.genConv(3, cfg)
    val (t2, g2) = TranscriptGen.genConv(3, cfg)
    assert(t1 == t2 && g1 == g2)
    assert(t1.nonEmpty && t1.map(_.turn_idx) == t1.indices)
  }

  test("P/R gate: extraction vs gold >= 0.95 over 300 conversations") {
    val cfg = TranscriptGen.Config(nConv = 300)
    var tp = 0L; var fp = 0L; var fn = 0L
    (0L until cfg.nConv).foreach { c =>
      val (turns, gold) = TranscriptGen.genConv(c, cfg)
      val goldSet = gold.groupBy(g => (g.conv_id, g.turn_idx))
      turns.foreach { t =>
        val got = TripleExtractor.extract(t.text)
          .map(e => (e.subj, e.pred, e.obj))
        val want = goldSet.getOrElse((t.conv_id, t.turn_idx), Nil)
          .map(g => (g.subj, g.pred, g.obj))
        val inter = got.toSet.intersect(want.toSet)
        tp += inter.size; fp += got.toSet.diff(want.toSet).size; fn += want.toSet.diff(inter).size
      }
    }
    val p = tp.toDouble / (tp + fp)
    val r = tp.toDouble / (tp + fn)
    info(f"precision=$p%.4f recall=$r%.4f tp=$tp fp=$fp fn=$fn")
    assert(p >= 0.95, f"precision $p%.4f < 0.95")
    assert(r >= 0.95, f"recall $r%.4f < 0.95")
  }

  test("mention detector finds multi-word gazetteer entries, longest match first") {
    val idx = MentionDetector.buildIndex(Seq("Ada Lovelace", "Acme", "Acme Corp", "Paris"))
    val spans = MentionDetector.detect("Ada Lovelace works at Acme Corp near Paris.", idx)
    assert(spans.map(_.norm) == Seq("ada lovelace", "acme corp", "paris"))
    val s0 = spans.head
    assert(s0.begin == 0 && s0.end == "Ada Lovelace".length)
  }
}
