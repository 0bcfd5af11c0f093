package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A deliberately tiny Cypher MATCH-subset parser over [[PatternMatch]] —
  * the Spark analog of the reference's string entry point
  * (reference: api/MemCypherSession.scala:76 `cypher(query)`; query shapes
  * from matching/MatchAcceptanceTest.scala:22 and apps/Demo.scala:31-42).
  * This is NOT an openCypher grammar: it covers exactly the fragment the
  * reference's own tests and apps exercise, and rejects everything else
  * with a clear error (the full grammar stays pinned in
  * [[graft.Capabilities.unsupported]] as `cypher_full_grammar`).
  *
  * Supported:
  * {{{
  * MATCH (n[:Label[:Label2]])(-->|-[:TYPE]->(m))*
  * [WHERE v.prop (=|<>|<|<=|>|>=) literal [AND ...] | v.prop IS NOT NULL]
  * RETURN [DISTINCT] item [, item ...]     item := v | v.prop [AS alias]
  * [ORDER BY key [ASC|DESC] [, ...]]       key  := v.prop | alias
  * [LIMIT k]
  * }}}
  *
  * Unaliased `v.prop` items surface under the binding-convention name
  * `v_prop` (RecordHeader naming, impl/table/RecordHeaderUtils.scala:23-27);
  * a bare `v` projects every `v_*` column. Patterns are a single directed
  * left-to-right path — no undirected/reverse arrows, var-length, OPTIONAL,
  * or multi-pattern commas (all pinned unsupported).
  */
object CypherLite {

  final case class ParseError(msg: String) extends IllegalArgumentException(
    s"CypherLite: $msg (supported fragment: MATCH path [WHERE ...] RETURN [DISTINCT] items [ORDER BY ...] [LIMIT n])")

  private val nodeRe = """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*((?::[A-Za-z_][A-Za-z0-9_]*)*)\s*\)""".r
  private val relRe = """-\[\s*(?:[A-Za-z_][A-Za-z0-9_]*)?\s*(?::([A-Za-z_][A-Za-z0-9_]*))?\s*\]->|-->""".r
  private val propRe = """([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)""".r

  private final case class Node(v: String, labels: Set[String])
  private final case class Hop(relType: Option[String], to: Node)

  /** Parse and run `query` against the graph behind `pm`. */
  def run(pm: PatternMatch, query: String): DataFrame = {
    val q = query.trim.replaceAll("\\s+", " ")
    // ASCII-only uppercase: String.toUpperCase can change LENGTH under
    // locale rules (ß→SS), which would misalign the keyword indices used to
    // substring `q`
    val upper = q.map(c => if (c >= 'a' && c <= 'z') (c - 32).toChar else c)
    for (kw <- Seq("OPTIONAL MATCH", "CREATE", "MERGE", "DELETE", "SET ", "UNION", "SKIP", "WITH "))
      if (upper.contains(kw)) throw ParseError(s"'${kw.trim}' is not in the supported fragment")

    def idxOf(kw: String): Int = upper.indexOf(kw)
    val iMatch = idxOf("MATCH ")
    val iReturn = idxOf(" RETURN ")
    if (iMatch != 0) throw ParseError("query must start with MATCH")
    if (iReturn < 0) throw ParseError("query must contain RETURN")
    val iWhere = idxOf(" WHERE ")
    val iOrder = idxOf(" ORDER BY ")
    val iLimit = idxOf(" LIMIT ")

    val patternStr = q.substring("MATCH ".length, if (iWhere >= 0) iWhere else iReturn).trim
    val whereStr = if (iWhere >= 0) Some(q.substring(iWhere + " WHERE ".length, iReturn).trim) else None
    val returnEnd = Seq(iOrder, iLimit).filter(_ > iReturn).sorted.headOption.getOrElse(q.length)
    val returnStr = q.substring(iReturn + " RETURN ".length, returnEnd).trim
    val orderStr = if (iOrder >= 0) {
      val end = if (iLimit > iOrder) iLimit else q.length
      Some(q.substring(iOrder + " ORDER BY ".length, end).trim)
    } else None
    val limitN = if (iLimit >= 0) Some(q.substring(iLimit + " LIMIT ".length).trim.toInt) else None

    // ---- pattern: (n[:L]) (rel (m[:L]))* — a single directed path ----
    if (patternStr.contains(",")) throw ParseError("multi-pattern MATCH is not supported")
    if (patternStr.contains("<-")) throw ParseError("only left-to-right -> patterns are supported")
    if (patternStr.contains("*")) throw ParseError("var-length patterns are not supported")
    val nodes = nodeRe.findAllMatchIn(patternStr).map(m =>
      Node(m.group(1), Option(m.group(2)).filter(_.nonEmpty)
        .map(_.split(":").filter(_.nonEmpty).toSet).getOrElse(Set.empty))).toList
    if (nodes.isEmpty) throw ParseError(s"no node pattern found in '$patternStr'")
    val rels = relRe.findAllMatchIn(patternStr).map(m => Option(m.group(1))).toList
    if (rels.length != nodes.length - 1)
      throw ParseError(s"pattern must be a linear path: ${nodes.length} nodes need ${nodes.length - 1} relationships, got ${rels.length}")
    // undirected "--" (two dashes not followed by '[' or '>') is invalid
    if ("""--(?!\[|>)""".r.findFirstIn(patternStr.replaceAll("""-->""", "")).isDefined)
      throw ParseError("undirected '--' patterns are not supported")

    var bound = pm.scan(nodes.head.v, nodes.head.labels)
    nodes.zip(nodes.tail).zip(rels).foreach { case ((from, to), relType) =>
      bound = pm.expand(bound, from.v, to.v, relType.toSet)
    }
    val vars = nodes.map(_.v).toSet

    def propCol(v: String, p: String): Column = {
      if (!vars.contains(v)) throw ParseError(s"unknown variable '$v'")
      col(s"${v}_$p")
    }

    // ---- WHERE: conjunction of simple comparisons ----
    whereStr.foreach { w =>
      if (w.toUpperCase.contains(" OR ")) throw ParseError("OR is not supported in WHERE")
      val conds = w.split("(?i) AND ").map(_.trim).map(parseCond(_, propCol))
      bound = bound.where(conds.reduce(_ && _))
    }

    // ---- RETURN ----
    val distinct = returnStr.toUpperCase.startsWith("DISTINCT ")
    val itemsStr = if (distinct) returnStr.substring("DISTINCT ".length) else returnStr
    val items: Seq[Column] = itemsStr.split(",").map(_.trim).toSeq.flatMap { it =>
      val parts = it.split("(?i) AS ").map(_.trim)
      val (expr, alias) = (parts(0), if (parts.length > 1) Some(parts(1)) else None)
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
        val (expr, desc) = k.toUpperCase match {
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

  private def parseCond(s: String, propCol: (String, String) => Column): Column = {
    val notNullRe = """(?i)(\w+)\.(\w+) IS NOT NULL""".r
    val nullRe = """(?i)(\w+)\.(\w+) IS NULL""".r
    val cmpRe = """(\w+)\.(\w+)\s*(=|<>|<=|>=|<|>)\s*(.+)""".r
    s match {
      case notNullRe(v, p) => propCol(v, p).isNotNull
      case nullRe(v, p) => propCol(v, p).isNull
      case cmpRe(v, p, op, rhs) =>
        val c = propCol(v, p)
        val l = literal(rhs.trim)
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

  private def literal(s: String): Column = {
    if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      lit(s.substring(1, s.length - 1))
    else if (s.matches("""-?\d+""")) lit(s.toLong)
    else if (s.matches("""-?\d+\.\d+""")) lit(s.toDouble)
    else if (s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")) lit(s.toBoolean)
    else throw ParseError(s"unsupported literal '$s'")
  }
}
