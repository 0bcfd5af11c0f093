package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A deliberately tiny Cypher MATCH-subset parser over [[PatternMatch]] —
  * the Spark analog of the reference's string entry point
  * (reference: api/MemCypherSession.scala:76 `cypher(query)`; query shapes
  * from matching/MatchAcceptanceTest.scala:22 and apps/Demo.scala:31-42).
  * This is NOT an openCypher grammar: it covers exactly the fragment the
  * reference's own tests and apps exercise — plus the runtime surface the
  * reference's evaluator supports beyond them: parameters
  * (impl/value/CypherMapOps.scala:39-41 `Param`, entering at
  * api/MemCypherSession.scala:70 `cypher(query, parameters, …)`) and
  * disjunction (`Ors`, CypherMapOps.scala:78-80) — and rejects everything
  * else with a clear error (the full grammar stays pinned in
  * [[graft.Capabilities.unsupported]] as `cypher_full_grammar`).
  *
  * Supported:
  * {{{
  * MATCH (n[:Label[:Label2]])(rel (m[:Label]))*
  *   rel := -->|--|<-- | -[[r][:TYPE]]-> | <-[[r][:TYPE]]- | -[[r][:TYPE]]-
  * [WHERE disjunct [OR disjunct ...]]      disjunct := cond [AND cond ...]
  *   cond := v.prop (=|<>|<|<=|>|>=) (literal|$param) | v.prop IS [NOT] NULL
  * RETURN [DISTINCT] item [, item ...]     item := v | v.prop [AS alias]
  * [ORDER BY key [ASC|DESC] [, ...]]       key  := v.prop | alias
  * [LIMIT (k|$param)]
  * }}}
  *
  * AND binds tighter than OR (standard precedence; no parentheses — the
  * reference's evaluator likewise only reduces flat And/Or lists). Reverse
  * arrows desugar to the flipped expand; undirected hops to a bag-union of
  * both directions (each relationship matches once per direction binding,
  * per Cypher semantics). Parameters substitute as typed literals at plan
  * build time — the Catalyst equivalent of the reference resolving `Param`
  * against the runtime context per row.
  *
  * Unaliased `v.prop` items surface under the binding-convention name
  * `v_prop` (RecordHeader naming, impl/table/RecordHeaderUtils.scala:23-27);
  * a bare `v` projects every `v_*` column. Keyword detection is
  * word-boundary + quote-aware: keywords inside single-quoted string
  * literals (or as substrings of identifiers, e.g. `n.skipCount`) are never
  * mistaken for clause boundaries.
  */
object CypherLite {

  final case class ParseError(msg: String) extends IllegalArgumentException(
    s"CypherLite: $msg (supported fragment: MATCH path [WHERE ...] RETURN [DISTINCT] items [ORDER BY ...] [LIMIT n])")

  private val nodeRe = """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*((?::[A-Za-z_][A-Za-z0-9_]*)*)\s*\)""".r
  // one regex for every arrow form; a hop with both '<' and '>' is rejected
  private val relRe =
    """(<)?-(?:\[\s*(?:[A-Za-z_][A-Za-z0-9_]*)?\s*(?::([A-Za-z_][A-Za-z0-9_]*))?\s*\])?-(>)?""".r
  private val propRe = """([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)""".r

  private sealed trait Dir
  private case object Out extends Dir
  private case object In extends Dir
  private case object Both extends Dir

  private final case class Node(v: String, labels: Set[String])

  /** Uppercased copy of `q` with the contents of single-quoted string
    * literals blanked to spaces: all keyword/operator searches run on this
    * masked string (so `'a OR b'` or `' LIMIT '` inside a literal never
    * splits a clause), while substrings are extracted from the original.
    * ASCII-only uppercase — String.toUpperCase can change LENGTH under
    * locale rules (ß→SS), which would misalign the indices used to slice.
    */
  private def maskedUpper(q: String): String = {
    val out = new Array[Char](q.length)
    var inQuote = false
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '\'') { inQuote = !inQuote; out(i) = '\'' }
      else if (inQuote) out(i) = ' '
      else out(i) = if (c >= 'a' && c <= 'z') (c - 32).toChar else c
      i += 1
    }
    new String(out)
  }

  private def wordBoundary(masked: String, start: Int, len: Int): Boolean = {
    // '.' counts as a word char so `n.skipCount` / `n.or` never read as the
    // SKIP / OR keywords ('$' likewise, for parameter names)
    def isWord(c: Char) = c.isLetterOrDigit || c == '_' || c == '.' || c == '$'
    (start == 0 || !isWord(masked.charAt(start - 1))) &&
      (start + len >= masked.length || !isWord(masked.charAt(start + len)))
  }

  /** First word-boundary occurrence of `kw` (uppercase, may contain spaces)
    * in the masked string, or -1.
    */
  private def findKw(masked: String, kw: String, from: Int = 0): Int = {
    var i = masked.indexOf(kw, from)
    while (i >= 0 && !wordBoundary(masked, i, kw.length))
      i = masked.indexOf(kw, i + 1)
    i
  }

  /** Split `s` on every word-boundary occurrence of `sep` (e.g. " OR ")
    * outside quoted literals.
    */
  private def splitOn(s: String, sep: String): Seq[String] = {
    val masked = maskedUpper(s)
    val parts = Seq.newBuilder[String]
    var start = 0
    var i = findKw(masked, sep)
    while (i >= 0) {
      parts += s.substring(start, i)
      start = i + sep.length
      i = findKw(masked, sep, start)
    }
    parts += s.substring(start)
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse and run `query` against the graph behind `pm`, resolving `$name`
    * references in WHERE/LIMIT against `params` (the reference's
    * `cypher(query, parameters, …)` surface, api/MemCypherSession.scala:70).
    */
  def run(pm: PatternMatch, query: String, params: Map[String, Any] = Map.empty): DataFrame = {
    val q = query.trim.replaceAll("\\s+", " ")
    val upper = maskedUpper(q)
    for (kw <- Seq("OPTIONAL MATCH", "CREATE", "MERGE", "DELETE", "SET", "UNION", "SKIP", "WITH"))
      if (findKw(upper, kw) >= 0) throw ParseError(s"'$kw' is not in the supported fragment")

    val iMatch = findKw(upper, "MATCH")
    val iReturn = findKw(upper, "RETURN")
    if (iMatch != 0) throw ParseError("query must start with MATCH")
    if (iReturn < 0) throw ParseError("query must contain RETURN")
    val iWhere = findKw(upper, "WHERE")
    val iOrder = findKw(upper, "ORDER BY")
    val iLimit = findKw(upper, "LIMIT")

    val patternStr = q.substring("MATCH ".length, if (iWhere >= 0) iWhere else iReturn).trim
    val whereStr = if (iWhere >= 0) Some(q.substring(iWhere + "WHERE ".length, iReturn).trim) else None
    val returnEnd = Seq(iOrder, iLimit).filter(_ > iReturn).sorted.headOption.getOrElse(q.length)
    val returnStr = q.substring(iReturn + "RETURN ".length, returnEnd).trim
    val orderStr = if (iOrder >= 0) {
      val end = if (iLimit > iOrder) iLimit else q.length
      Some(q.substring(iOrder + "ORDER BY ".length, end).trim)
    } else None
    val limitN = if (iLimit >= 0) {
      val raw = q.substring(iLimit + "LIMIT ".length).trim
      val resolved = if (raw.startsWith("$")) param(params, raw.substring(1)) else raw
      try Some(resolved.toString.trim.toInt)
      catch { case _: NumberFormatException => throw ParseError(s"LIMIT expects an integer, got '$raw'") }
    } else None

    // ---- pattern: (n[:L]) (rel (m[:L]))* — a single linear path ----
    if (patternStr.contains(",")) throw ParseError("multi-pattern MATCH is not supported")
    if (patternStr.contains("*")) throw ParseError("var-length patterns are not supported")
    val nodes = nodeRe.findAllMatchIn(patternStr).map(m =>
      Node(m.group(1), Option(m.group(2)).filter(_.nonEmpty)
        .map(_.split(":").filter(_.nonEmpty).toSet).getOrElse(Set.empty))).toList
    if (nodes.isEmpty) throw ParseError(s"no node pattern found in '$patternStr'")
    // only the path segments BETWEEN node patterns may contain arrows
    val rels = relRe.findAllMatchIn(patternStr).map { m =>
      val (lt, gt) = (m.group(1) != null, m.group(3) != null)
      val dir: Dir =
        if (lt && gt) throw ParseError(s"'${m.matched}' has both arrow heads")
        else if (gt) Out else if (lt) In else Both
      (Option(m.group(2)), dir)
    }.toList
    if (rels.length != nodes.length - 1)
      throw ParseError(s"pattern must be a linear path: ${nodes.length} nodes need ${nodes.length - 1} relationships, got ${rels.length}")

    // reverse arrows run over the flipped edge view (dst⇄src swapped): the
    // same inner-join Expand, planned by Catalyst either way
    lazy val flippedPm = pm.copy(edges = pm.edges.select(
      pm.edges.columns.map {
        case "src" => col("dst").as("src")
        case "dst" => col("src").as("dst")
        case c => col(c)
      }.toSeq: _*))

    // label constraints on non-head nodes apply as a post-hop filter —
    // Catalyst pushes it down into the expand join's node-scan side, so the
    // plan is the same label-pruned scan the head node gets
    def labelFilter(df: DataFrame, n: Node): DataFrame =
      n.labels.foldLeft(df)((d, l) => d.where(array_contains(col(s"${n.v}_labels"), l)))

    var bound = pm.scan(nodes.head.v, nodes.head.labels)
    nodes.zip(nodes.tail).zip(rels).foreach { case ((from, to), (relType, dir)) =>
      val hopped = dir match {
        case Out => pm.expand(bound, from.v, to.v, relType.toSet)
        case In => flippedPm.expand(bound, from.v, to.v, relType.toSet)
        case Both => // bag union: one row per relationship per direction binding
          pm.expand(bound, from.v, to.v, relType.toSet)
            .unionByName(flippedPm.expand(bound, from.v, to.v, relType.toSet))
      }
      bound = labelFilter(hopped, to)
    }
    val vars = nodes.map(_.v).toSet

    def propCol(v: String, p: String): Column = {
      if (!vars.contains(v)) throw ParseError(s"unknown variable '$v'")
      col(s"${v}_$p")
    }

    // ---- WHERE: OR of AND-conjunctions (AND binds tighter, standard
    // precedence; reference evaluates flat Ands/Ors lists the same way,
    // CypherMapOps.scala:74-80) ----
    whereStr.foreach { w =>
      val disjuncts = splitOn(w, "OR").map { d =>
        splitOn(d, "AND").map(parseCond(_, propCol, params)).reduce(_ && _)
      }
      bound = bound.where(disjuncts.reduce(_ || _))
    }

    // ---- RETURN ----
    val distinct = maskedUpper(returnStr).startsWith("DISTINCT ")
    val itemsStr = if (distinct) returnStr.substring("DISTINCT ".length) else returnStr
    val items: Seq[Column] = itemsStr.split(",").map(_.trim).toSeq.flatMap { it =>
      val parts = splitOn(it, "AS")
      val (expr, alias) = (parts.head, if (parts.length > 1) Some(parts(1)) else None)
      expr match {
        case propRe(v, p) => Seq(propCol(v, p).as(alias.getOrElse(s"${v}_$p")))
        case v if vars.contains(v) =>
          if (alias.isDefined) throw ParseError(s"AS on a bare variable '$v' is not supported")
          bound.columns.filter(_.startsWith(s"${v}_")).toSeq.map(col)
        case other => throw ParseError(s"unsupported RETURN item '$other'")
      }
    }
    var out = bound.select(items: _*)
    if (distinct) out = out.distinct()

    // ---- ORDER BY ----
    orderStr.foreach { o =>
      val keys = o.split(",").map(_.trim).map { k =>
        val (expr, desc) = maskedUpper(k) match {
          case u if u.endsWith(" DESC") => (k.dropRight(5).trim, true)
          case u if u.endsWith(" ASC") => (k.dropRight(4).trim, false)
          case _ => (k, false)
        }
        val c = expr match {
          case propRe(v, p) => col(s"${v}_$p") // post-projection name
          case name => col(name) // an alias from RETURN
        }
        if (desc) c.desc else c.asc
      }
      out = out.orderBy(keys.toSeq: _*)
    }
    limitN.foreach(n => out = out.limit(n))
    out
  }

  private def param(params: Map[String, Any], name: String): Any =
    params.getOrElse(name, throw ParseError(s"missing parameter $$$name"))

  private def parseCond(s: String, propCol: (String, String) => Column,
      params: Map[String, Any]): Column = {
    val notNullRe = """(?i)(\w+)\.(\w+) IS NOT NULL""".r
    val nullRe = """(?i)(\w+)\.(\w+) IS NULL""".r
    val cmpRe = """(\w+)\.(\w+)\s*(=|<>|<=|>=|<|>)\s*(.+)""".r
    s match {
      case notNullRe(v, p) => propCol(v, p).isNotNull
      case nullRe(v, p) => propCol(v, p).isNull
      case cmpRe(v, p, op, rhs) =>
        val c = propCol(v, p)
        val l = literal(rhs.trim, params)
        op match {
          case "=" => c === l
          case "<>" => c =!= l
          case "<" => c < l
          case "<=" => c <= l
          case ">" => c > l
          case ">=" => c >= l
        }
      case other => throw ParseError(s"unsupported WHERE condition '$other'")
    }
  }

  private def literal(s: String, params: Map[String, Any]): Column = {
    if (s.startsWith("$")) typedLit(param(params, s.substring(1)))
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      lit(s.substring(1, s.length - 1))
    else if (s.matches("""-?\d+""")) lit(s.toLong)
    else if (s.matches("""-?\d+\.\d+""")) lit(s.toDouble)
    else if (s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")) lit(s.toBoolean)
    else throw ParseError(s"unsupported literal '$s'")
  }

  /** Parameter value → typed literal column. The supported value types
    * mirror the reference's CypherValue scalar surface (SURVEY.md §1.2).
    */
  private def typedLit(v: Any): Column = v match {
    case s: String => lit(s)
    case i: Int => lit(i.toLong)
    case l: Long => lit(l)
    case d: Double => lit(d)
    case f: Float => lit(f.toDouble)
    case b: Boolean => lit(b)
    case other => throw ParseError(s"unsupported parameter type ${other.getClass.getSimpleName}")
  }
}
