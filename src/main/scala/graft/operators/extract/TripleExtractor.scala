package graft.operators.extract

import scala.util.matching.Regex

/** The frozen, deterministic triple-extraction spec: a pure function of the
  * turn text only (SURVEY.md §7.6(2) — extraction must be a pure function of
  * (text, turn ordering)). This is the single source of truth the P/R ≥ 0.95
  * gate measures against; both the Spark stage and the in-test golden
  * expectations call exactly this code.
  *
  * The pattern inventory matches the generator grammar (FIXTURES.md §1):
  * every supported utterance template has one anchored pattern. Patterns are
  * applied per sentence; the first matching pattern wins (templates are
  * mutually exclusive by construction).
  */
object TripleExtractor {

  final case class Extraction(sentIdx: Int, subj: String, pred: String, obj: String)

  /** (anchored regex with exactly 2 entity groups, predicate). Order matters:
    * first match wins within a sentence.
    */
  val patterns: Seq[(Regex, String)] = Seq(
    ("""^(.+?) works at (.+?)$""".r, "WORKS_AT"),
    ("""^(.+?) was founded by (.+?) in \d{4}$""".r, "FOUNDED_BY"),
    ("""^(.+?) lives in (.+?)$""".r, "LIVES_IN"),
    ("""^(.+?) is located in (.+?)$""".r, "LOCATED_IN"),
    ("""^(.+?) is based in (.+?)$""".r, "BASED_IN"),
    ("""^I asked (.+?) about (.+?)$""".r, "ASKED_ABOUT"),
    ("""^(.+?) moved to (.+?)$""".r, "MOVED_TO"),
    ("""^(.+?) acquired (.+?)$""".r, "ACQUIRED"),
    ("""^(.+?) is the capital of (.+?)$""".r, "CAPITAL_OF"),
    ("""^(.+?) reports to (.+?)$""".r, "REPORTS_TO")
  )

  // precompiled: these run once per turn/sentence on the executor hot path
  private val sentenceSplit = java.util.regex.Pattern.compile("""(?<=[.!?])\s+""")
  private val trailingTerm = java.util.regex.Pattern.compile("""[.!?]+$""")

  /** Split on sentence-final period/question/exclamation + whitespace, keep
    * deterministic sentence indexes, strip the trailing terminator.
    */
  def sentences(text: String): Seq[String] =
    sentenceSplit.split(text).toSeq.map(s => trailingTerm.matcher(s).replaceAll("").trim)

  /** Extract all (subj, pred, obj) triples from one turn's text. */
  def extract(text: String): Seq[Extraction] =
    sentences(text).zipWithIndex.flatMap { case (s, i) =>
      if (s.isEmpty) None
      else patterns.iterator.flatMap { case (re, pred) =>
        re.findFirstMatchIn(s).map(m => Extraction(i, m.group(1).trim, pred, m.group(2).trim))
      }.nextOption()
    }
}

/** Gazetteer-driven mention detection: longest-match sliding n-gram scan of a
  * turn's tokens against a broadcast set of normalized entity surfaces.
  * Deterministic and pure; the Spark stage broadcasts the index and calls
  * `detect` per turn.
  */
object MentionDetector {

  final case class Span(surface: String, norm: String, begin: Int, end: Int)

  // precompiled: norm runs per candidate n-gram on the executor hot path
  private val wsSplit = java.util.regex.Pattern.compile("""\s+""")
  private val edgePunct =
    java.util.regex.Pattern.compile("""^[^\p{L}\p{N}#_]+|[^\p{L}\p{N}#_]+$""")

  /** Normalization applied to both gazetteer entries and candidate surfaces:
    * lowercase + strip edge punctuation per token.
    */
  def norm(s: String): String =
    wsSplit.split(s.toLowerCase).map(t => edgePunct.matcher(t).replaceAll(""))
      .filter(_.nonEmpty).mkString(" ")

  final class Index(entries: Set[String], val maxGram: Int) extends Serializable {
    def contains(n: String): Boolean = entries.contains(n)
  }

  def buildIndex(surfaces: Iterable[String]): Index = {
    val normed = surfaces.iterator.map(norm).filter(_.nonEmpty).toSet
    val maxGram = if (normed.isEmpty) 1 else normed.iterator.map(_.count(_ == ' ') + 1).max
    new Index(normed, maxGram)
  }

  private final case class Tok(text: String, begin: Int, end: Int)

  private val nonWs = java.util.regex.Pattern.compile("""\S+""")

  private def tokenize(text: String): Array[Tok] = {
    val out = Array.newBuilder[Tok]
    val m = nonWs.matcher(text)
    while (m.find()) out += Tok(text.substring(m.start, m.end), m.start, m.end)
    out.result()
  }

  /** Longest-match-first scan; overlapping shorter matches inside an accepted
    * longer match are suppressed. O(tokens × maxGram).
    */
  def detect(text: String, index: Index): Seq[Span] = {
    val toks = tokenize(text)
    val out = Seq.newBuilder[Span]
    var i = 0
    while (i < toks.length) {
      var len = math.min(index.maxGram, toks.length - i)
      var matched = false
      while (len >= 1 && !matched) {
        val surface = text.substring(toks(i).begin, toks(i + len - 1).end)
        val n = norm(surface)
        if (n.nonEmpty && index.contains(n)) {
          out += Span(surface, n, toks(i).begin, toks(i + len - 1).end)
          i += len
          matched = true
        } else len -= 1
      }
      if (!matched) i += 1
    }
    out.result()
  }
}
