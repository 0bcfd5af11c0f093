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

  /** Literal prescreen per pattern: every regex above carries a fixed infix,
    * so a sentence that doesn't `contains` it can't match — and `contains`
    * is an order of magnitude cheaper than entering the regex engine. The
    * regex remains the sole decider; the prescreen only skips certain
    * non-matches (hot path: ~10 regex engines per sentence → ~10 indexOf
    * scans + usually 1 regex).
    */
  private val prescreen: Array[String] = Array(
    " works at ", " was founded by ", " lives in ", " is located in ",
    " is based in ", "I asked ", " moved to ", " acquired ",
    " is the capital of ", " reports to ")
  private val patternArr: Array[(Regex, String)] = patterns.toArray

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
      else {
        var found: Option[Extraction] = None
        var p = 0
        while (found.isEmpty && p < patternArr.length) {
          if (s.contains(prescreen(p))) {
            val (re, pred) = patternArr(p)
            found = re.findFirstMatchIn(s)
              .map(m => Extraction(i, m.group(1).trim, pred, m.group(2).trim))
          }
          p += 1
        }
        found
      }
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

  /** Lookup surface the detector scans against. Two implementations:
    * [[buildIndex]]'s in-memory set (tests / driver-generated vocabularies)
    * and [[FileIndex]] (the scale path: the surface list is built and
    * written DISTRIBUTED, never materialized on the driver, and each
    * executor JVM loads it once from storage).
    */
  sealed abstract class Index extends Serializable {
    def contains(n: String): Boolean
    def maxGram: Int
  }

  private final class SetIndex(entries: Set[String], val maxGram: Int) extends Index {
    def contains(n: String): Boolean = entries.contains(n)
  }

  def buildIndex(surfaces: Iterable[String]): Index = {
    val normed = surfaces.iterator.map(norm).filter(_.nonEmpty).toSet
    new SetIndex(normed, maxGramOf(normed))
  }

  private def maxGramOf(normed: Iterable[String]): Int =
    if (normed.isEmpty) 1 else normed.iterator.map(_.count(_ == ' ') + 1).max

  /** File-backed gazetteer index: serializes as the path plus the active
    * Hadoop-config DELTA (the spark.hadoop.* entries the session injected on
    * top of the site defaults — defaultFS, s3a/hdfs credentials — typically
    * a handful of strings), and each JVM — driver or executor — lazily loads
    * the surface file once on first lookup via a process-wide cache keyed by
    * path + content fingerprint (part names/sizes/mtimes), so a path
    * rewritten with different content never serves a stale index. This is
    * how a web-scale vocabulary ships without ever passing through the
    * driver: [[writeIndexFile]] normalizes/dedups/writes it distributed, and
    * the detector tasks read it straight from shared storage (Hadoop
    * FileSystem — local paths here, hdfs://-style URIs on a cluster).
    */
  final class FileIndex private[extract] (val path: String,
      confDelta: Map[String, String]) extends Index {
    def this(path: String) = this(path, FileIndex.activeConfDelta())
    @transient private lazy val delegate: Index = FileIndex.load(path, confDelta)
    def contains(n: String): Boolean = delegate.contains(n)
    def maxGram: Int = delegate.maxGram
  }

  object FileIndex {
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, Index]

    /** Entries the active session's Hadoop configuration carries beyond the
      * site/default files (which every executor also has on its classpath):
      * exactly the programmatically-injected spark.hadoop.* surface that a
      * bare `new Configuration()` on an executor would silently drop.
      */
    private[extract] def activeConfDelta(): Map[String, String] =
      org.apache.spark.sql.SparkSession.getActiveSession.map { s =>
        val conf = s.sparkContext.hadoopConfiguration
        val defaults = new org.apache.hadoop.conf.Configuration()
        val out = Map.newBuilder[String, String]
        val it = conf.iterator()
        while (it.hasNext) {
          val e = it.next()
          if (defaults.get(e.getKey) != e.getValue) out += e.getKey -> e.getValue
        }
        out.result()
      }.getOrElse(Map.empty)

    private def load(path: String, confDelta: Map[String, String]): Index = {
      val conf = new org.apache.hadoop.conf.Configuration()
      confDelta.foreach { case (k, v) => conf.set(k, v) }
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(conf)
      val parts = fs.listStatus(hp).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      // content fingerprint in the cache key: one cheap listStatus per
      // deserialized instance, and a rewritten gazetteer at the same path
      // (same JVM) loads fresh instead of serving the dead index
      val fp = graft.util.Hashing.fnv64(parts.map(s =>
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}").sorted.mkString("|"))
      cache.computeIfAbsent(s"$path@${java.lang.Long.toHexString(fp)}", { _ =>
        val entries = new java.util.HashSet[String]()
        var maxGram = 1
        parts.foreach { part =>
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(part.getPath), java.nio.charset.StandardCharsets.UTF_8))
          try {
            var line = in.readLine()
            while (line != null) {
              if (line.nonEmpty) {
                entries.add(line)
                val g = line.count(_ == ' ') + 1
                if (g > maxGram) maxGram = g
              }
              line = in.readLine()
            }
          } finally in.close()
        }
        val mg = maxGram
        new Index {
          def contains(n: String): Boolean = entries.contains(n)
          def maxGram: Int = mg
        }
      })
    }
  }

  /** Build a gazetteer file distributed — normalize, dedup, write one
    * surface per line — and return its [[FileIndex]]. No driver
    * materialization anywhere: the vocabulary table can be arbitrarily
    * large as long as the final surface set fits one executor's heap
    * (the same bound a broadcast dictionary has).
    */
  def writeIndexFile(surfaces: org.apache.spark.sql.Dataset[String], path: String): FileIndex = {
    val spark = surfaces.sparkSession
    import spark.implicits._
    surfaces.map(norm).filter(_.nonEmpty).distinct()
      .write.mode("overwrite").text(path)
    new FileIndex(path)
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
    *
    * Each token is normalized ONCE up front and candidate keys are assembled
    * from the normalized tokens: `norm(text.substring(tok_i.begin,
    * tok_j.end))` splits on exactly the whitespace `tokenize` split on, so
    * joining the per-token normalizations with single spaces (dropping
    * empties) is the same string — without re-running the lowercase+regex
    * pair on every one of the O(tokens × maxGram) candidate n-grams (the
    * pipeline's single hottest loop: it halved the mentions stage).
    */
  def detect(text: String, index: Index): Seq[Span] = {
    val toks = tokenize(text)
    val normed = new Array[String](toks.length)
    var t = 0
    while (t < toks.length) {
      normed(t) = edgePunct.matcher(toks(t).text.toLowerCase).replaceAll("")
      t += 1
    }
    val sb = new java.lang.StringBuilder(64)
    val out = Seq.newBuilder[Span]
    var i = 0
    while (i < toks.length) {
      var len = math.min(index.maxGram, toks.length - i)
      var matched = false
      while (len >= 1 && !matched) {
        sb.setLength(0)
        var k = i
        while (k < i + len) {
          if (!normed(k).isEmpty) {
            if (sb.length > 0) sb.append(' ')
            sb.append(normed(k))
          }
          k += 1
        }
        val n = sb.toString
        if (!n.isEmpty && index.contains(n)) {
          out += Span(text.substring(toks(i).begin, toks(i + len - 1).end), n,
            toks(i).begin, toks(i + len - 1).end)
          i += len
          matched = true
        } else len -= 1
      }
      if (!matched) i += 1
    }
    out.result()
  }
}
