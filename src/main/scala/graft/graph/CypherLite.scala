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
  * api/MemCypherSession.scala:70 `cypher(query, parameters, …)`),
  * disjunction (`Ors`, CypherMapOps.scala:78-80), relationship values with
  * `type`/`startNode`/`endNode` (CypherMapOps.scala:43-45; rel rows
  * flattened at api/MemCypherGraph.scala:129-140), aggregating RETURN
  * (api/MemCypherRecords.scala:99-162), multi-pattern MATCH (planned as
  * CartesianProduct, impl/planning/MemOperatorProducer.scala:115-118) and
  * WITH query-part chaining (the TCK WithAcceptance scenarios the reference
  * runs green — projection/aliasing, implicit-grouping aggregation,
  * DISTINCT, post-WITH WHERE, passing bound nodes into a follow-up MATCH;
  * the blacklisted ones — ORDER BY/SKIP/LIMIT inside WITH, null-literal
  * projection, nested maps — stay out) — and rejects everything else with a
  * clear error (the full grammar stays pinned in
  * [[graft.Capabilities.unsupported]] as `cypher_full_grammar`).
  *
  * Supported:
  * {{{
  * MATCH path [, path ...]
  *   path := (n[:Label[:Label2]])(rel (m[:Label]))*
  *   rel  := -->|--|<-- | -[[r][:TYPES][*len]]-> | <-[[r][:TYPES][*len]]-
  *        | -[[r][:TYPES][*len]]-
  *   TYPES := TYPE[|TYPE2...]   (alternation: any of the types matches)
  *   len  := n | lo..hi | ..hi  (bounded var-length; lo defaults to 1; no
  *                               rel variable on a var-length hop — Cypher
  *                               binds a LIST there, outside the fragment)
  * [WHERE disjunct [OR disjunct ...]]      disjunct := cond [AND cond ...]
  *   cond := ref (=|<>|<|<=|>|>=) (literal|$param) | ref IS [NOT] NULL
  *   ref  := v.prop | type(r) | startNode(r) | endNode(r) | alias
  * (OPTIONAL MATCH path [, path ...]       (left-outer-joined onto the
  *   [WHERE ...] )*                         bound rows; its WHERE filters
  *                                          the optional side PRE-join)
  * ( WITH [DISTINCT] witem [, witem ...]   witem := v | ref AS alias
  *                                                | agg AS alias
  *   [WHERE ...]                           (filters the WITH projection —
  *   [MATCH path [, path ...]              HAVING when aggregated)
  *    [WHERE ...]] )*
  * RETURN [DISTINCT] item [, item ...]
  *   item := v | ref [AS alias] | agg [AS alias]
  *   agg  := count(*) | count([DISTINCT] ref) | min(ref) | max(ref)
  *        | sum(ref) | collect(ref)
  * [ORDER BY key [ASC|DESC] [, ...]]       key  := v.prop | alias
  * [LIMIT (k|$param)]
  *
  * query [UNION ALL query ...]             (full queries; same column names
  *                                          in the same order, per Cypher —
  *                                          no ORDER BY/LIMIT inside parts)
  * }}}
  *
  * Semantics notes:
  *  - AND binds tighter than OR (standard precedence; no parentheses — the
  *    reference's evaluator likewise only reduces flat And/Or lists).
  *  - Reverse arrows desugar to the flipped expand; undirected hops to a bag
  *    union of both directions (each relationship matches once per direction
  *    binding, per Cypher) EXCEPT self-loops, which match exactly once (both
  *    direction bindings of a loop are the same binding — Neo4j semantics).
  *  - Relationship variables always bind with STORAGE orientation:
  *    `startNode(r)`/`endNode(r)` (surfaced as `r_src`/`r_dst`) report the
  *    stored endpoints regardless of which way the arrow was traversed.
  *  - Multiple comma-separated paths combine like the reference's
  *    CartesianProduct planning: disjoint paths cross-join; paths sharing a
  *    node variable equi-join on that variable's binding.
  *  - OPTIONAL MATCH plans its pattern like a MATCH, applies its own WHERE
  *    to that plan (pre-join, Cypher's semantics — the predicate is part of
  *    the optional pattern), then LEFT-outer-joins onto the bound rows on
  *    the shared node variables' id bindings (the reference plans optional
  *    parts onto LeftOuterJoin, impl/planning/BinaryOperator.scala:58-60);
  *    rows with no optional match null-pad the optional-only variables. At
  *    least one bound node variable must be shared — a disconnected
  *    optional pattern is outside the fragment.
  *  - UNION ALL combines full queries by bag union (the reference's
  *    TabularUnionAll, impl/planning/BinaryOperator.scala:75-80, planned at
  *    MemOperatorProducer.scala:120-122); Cypher's rule applies — every
  *    part must return the same column names in the same order. UNION
  *    (distinct) stays outside the fragment, as do ORDER BY/LIMIT inside
  *    union parts.
  *  - Aggregates in RETURN group by the non-aggregated items (Cypher's
  *    implicit grouping). `collect` is the engine's deterministic collect
  *    (sorted ascending), matching the programmatic operator (q06).
  *  - WITH narrows the in-flight table to its items: bare variables carry
  *    their whole binding forward (and may seed a follow-up MATCH — shared
  *    variables equi-join on the binding, like the reference's
  *    CartesianProduct planning between query parts); expressions must be
  *    aliased (openCypher's own rule) and become plain columns referenced
  *    by alias afterwards. A WHERE directly after WITH filters the
  *    projection (HAVING when the WITH aggregated).
  *  - Parameters substitute as typed literals at plan build time — the
  *    Catalyst equivalent of the reference resolving `Param` per row.
  *  - Quote escapes (`\'` or `''`) are OUTSIDE the fragment and rejected
  *    up front (a ParseError, never a silent misparse); whitespace is
  *    normalized only outside string literals, so literal values survive
  *    verbatim.
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
    s"CypherLite: $msg (supported fragment: MATCH path[, path ...] [WHERE ...] (OPTIONAL MATCH path [WHERE ...])* (WITH items [WHERE ...] [MATCH ...])* RETURN [DISTINCT] items [ORDER BY ...] [LIMIT n], parts joinable by UNION ALL)")

  private val nodeRe = """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*((?::[A-Za-z_][A-Za-z0-9_]*)*)\s*\)""".r
  // one regex for every arrow form; a hop with both '<' and '>' is rejected
  private val relRe =
    """(<)?-(?:\[\s*([A-Za-z_][A-Za-z0-9_]*)?\s*(?::([A-Za-z_][A-Za-z0-9_]*(?:\s*\|\s*[A-Za-z_][A-Za-z0-9_]*)*))?\s*(\*[0-9.\s]*)?\])?-(>)?""".r
  private val varLenRe = """\*\s*(\d*)\s*(?:(\.\.)\s*(\d*))?\s*""".r
  private val propRe = """([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)""".r
  private val funcRe = """(?i)(type|startnode|endnode)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val aggRe = """(?i)(count|min|max|sum|collect)\s*\(\s*(.+?)\s*\)""".r

  private sealed trait Dir
  private case object Out extends Dir
  private case object In extends Dir
  private case object Both extends Dir

  /** `*`-spec inside a relationship pattern → (minHops, maxHops). Bounded
    * forms only: `*n`, `*lo..hi`, `*..hi` (lo defaults to 1, Cypher's
    * default). Unbounded `*` / `*lo..` are rejected — bounded traversal is
    * the operator's contract ([[PatternMatch.expandVarLength]]).
    */
  private def parseVarLen(spec: String): (Int, Int) = spec match {
    case varLenRe(lo, dots, hi) =>
      val l = if (lo == null || lo.isEmpty) 1 else lo.toInt
      val h =
        if (dots == null) {
          if (lo == null || lo.isEmpty)
            throw ParseError("unbounded var-length ('*') is not in the supported fragment — give an upper bound, e.g. *1..3")
          else l // '*n' = exactly n hops
        } else if (hi == null || hi.isEmpty)
          throw ParseError(s"var-length '*$lo..' has no upper bound — bounded forms only (e.g. *1..3)")
        else hi.toInt
      if (l > h) throw ParseError(s"var-length '*$l..$h' has min > max")
      (l, h)
    case _ => throw ParseError(s"cannot parse var-length spec '${spec.trim}'")
  }

  private final case class Node(v: String, labels: Set[String])
  private final case class PathPlan(df: DataFrame, nodeVars: Set[String], relVars: Set[String])

  /** Uppercased copy of `q` with the contents of single-quoted string
    * literals blanked to spaces: all keyword/operator searches run on this
    * masked string (so `'a OR b'` or `' LIMIT '` inside a literal never
    * splits a clause), while substrings are extracted from the original.
    * ASCII-only uppercase — String.toUpperCase can change LENGTH under
    * locale rules (ß→SS), which would misalign the indices used to slice.
    * Escape sequences cannot desynchronize the quote tracking because
    * [[normalize]] rejected them before this runs.
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

  /** Collapse whitespace runs to single spaces OUTSIDE string literals only
    * (inside a literal every character is data), after rejecting the quote
    * escapes the fragment does not support — `\'` or `''` would flip the
    * quote tracking mid-literal and silently misparse everything after.
    */
  private def normalize(q0: String): String = {
    val q = q0.trim
    if (q.contains("\\'"))
      throw ParseError("""escaped quotes (\') inside string literals are not in the supported fragment""")
    if (q.contains("''"))
      throw ParseError("doubled-quote escapes ('') — and empty string literals — are not in the supported fragment")
    val sb = new StringBuilder(q.length)
    var inQuote = false
    var lastWs = false
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '\'') { inQuote = !inQuote; sb.append(c); lastWs = false }
      else if (!inQuote && Character.isWhitespace(c)) {
        if (!lastWs) sb.append(' ')
        lastWs = true
      } else { sb.append(c); lastWs = false }
      i += 1
    }
    if (inQuote) throw ParseError("unterminated string literal")
    sb.toString
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
    val q = normalize(query)
    // UNION ALL between full queries → the reference's TabularUnionAll
    // (impl/planning/BinaryOperator.scala:75-80, planned at
    // MemOperatorProducer.scala:120-122). Split first so the bare-UNION
    // rejection below only ever sees the distinct variant.
    val parts = splitOn(q, "UNION ALL")
    if (parts.length > 1) {
      val dfs = parts.map { p =>
        val mu = maskedUpper(p)
        for (kw <- Seq("ORDER BY", "LIMIT"))
          if (findKw(mu, kw) >= 0)
            throw ParseError(s"'$kw' inside a UNION ALL part is not in the supported fragment")
        runSingle(pm, p, params)
      }
      val head = dfs.head.columns.toSeq
      dfs.tail.foreach { d =>
        if (d.columns.toSeq != head)
          throw ParseError("UNION ALL parts must return the same column names in the same order: " +
            s"(${head.mkString(", ")}) vs (${d.columns.mkString(", ")})")
      }
      dfs.reduceLeft(_ unionByName _)
    } else runSingle(pm, q, params)
  }

  private def runSingle(pm: PatternMatch, q: String, params: Map[String, Any]): DataFrame = {
    val upper = maskedUpper(q)
    for (kw <- Seq("CREATE", "MERGE", "DELETE", "SET", "SKIP"))
      if (findKw(upper, kw) >= 0) throw ParseError(s"'$kw' is not in the supported fragment")
    if (findKw(upper, "UNION") >= 0)
      throw ParseError("UNION (distinct) is not in the supported fragment — UNION ALL is")

    // ---- clause segmentation: every top-level keyword, in query order ----
    case class Clause(kw: String, body: String)
    val rawStarts = Seq("MATCH", "OPTIONAL MATCH", "WHERE", "WITH", "RETURN", "ORDER BY", "LIMIT").flatMap { kw =>
      var acc = List.empty[(Int, String)]
      var i = findKw(upper, kw)
      while (i >= 0) { acc ::= ((i, kw)); i = findKw(upper, kw, i + kw.length) }
      acc
    }.sortBy(_._1)
    // the MATCH inside each OPTIONAL MATCH also matched the bare keyword —
    // drop those shadowed hits
    val optMatchAt = rawStarts.collect {
      case (i, "OPTIONAL MATCH") => i + "OPTIONAL ".length
    }.toSet
    val starts = rawStarts.filterNot { case (i, kw) => kw == "MATCH" && optMatchAt.contains(i) }
    if (starts.isEmpty || starts.head != ((0, "MATCH")))
      throw ParseError("query must start with MATCH")
    if (starts.count(_._2 == "RETURN") != 1)
      throw ParseError("query must contain exactly one RETURN")
    val clauses = starts.zipWithIndex.map { case ((at, kw), idx) =>
      val end = if (idx + 1 < starts.length) starts(idx + 1)._1 else q.length
      Clause(kw, q.substring(at + kw.length, end).trim)
    }

    // reverse arrows run over the flipped edge view (dst⇄src swapped): the
    // same inner-join Expand, planned by Catalyst either way
    lazy val flippedPm = pm.copy(edges = pm.edges.select(
      pm.edges.columns.map {
        case "src" => col("dst").as("src")
        case "dst" => col("src").as("dst")
        case c => col(c)
      }.toSeq: _*))
    // the undirected hop's second branch additionally EXCLUDES self-loops:
    // both direction bindings of a loop edge are the same binding, so the
    // forward branch already produced its one row (Neo4j returns one row for
    // MATCH (a)-[r]-(b) on a loop)
    lazy val flippedNoSelf = flippedPm.copy(
      edges = flippedPm.edges.where(col("src") =!= col("dst")))

    // label constraints on non-head nodes apply as a post-hop filter —
    // Catalyst pushes it down into the expand join's node-scan side, so the
    // plan is the same label-pruned scan the head node gets
    def labelFilter(df: DataFrame, n: Node): DataFrame =
      n.labels.foldLeft(df)((d, l) => d.where(array_contains(col(s"${n.v}_labels"), l)))

    // rel binding with storage orientation: an In-hop runs over the flipped
    // view, so its bound r_src/r_dst arrive swapped — swap them back (one
    // select projection: withColumnsRenamed applies its map sequentially and
    // cannot express a swap)
    def unflip(df: DataFrame, rv: String): DataFrame =
      df.select(df.columns.map {
        case c if c == s"${rv}_src" => col(c).as(s"${rv}_dst")
        case c if c == s"${rv}_dst" => col(c).as(s"${rv}_src")
        case c => col(c)
      }.toSeq: _*)

    def planPath(pathStr: String): PathPlan = {
      val nodes = nodeRe.findAllMatchIn(pathStr).map(m =>
        Node(m.group(1), Option(m.group(2)).filter(_.nonEmpty)
          .map(_.split(":").filter(_.nonEmpty).toSet).getOrElse(Set.empty))).toList
      if (nodes.isEmpty) throw ParseError(s"no node pattern found in '$pathStr'")
      val vs = nodes.map(_.v)
      if (vs.distinct.length != vs.length)
        throw ParseError(s"repeated variable in a single path '$pathStr' (cycle closing is the programmatic expandInto)")
      val rels = relRe.findAllMatchIn(pathStr).map { m =>
        val (lt, gt) = (m.group(1) != null, m.group(5) != null)
        val dir: Dir =
          if (lt && gt) throw ParseError(s"'${m.matched}' has both arrow heads")
          else if (gt) Out else if (lt) In else Both
        val types = Option(m.group(3))
          .map(_.split("\\|").map(_.trim).filter(_.nonEmpty).toSet)
          .getOrElse(Set.empty[String])
        val varLen = Option(m.group(4)).map(parseVarLen)
        if (varLen.isDefined && m.group(2) != null)
          throw ParseError("binding a relationship variable on a var-length hop " +
            "(a LIST of relationships in Cypher) is not in the supported fragment")
        (Option(m.group(2)), types, dir, varLen)
      }.toList
      if (rels.length != nodes.length - 1)
        throw ParseError(s"pattern must be a linear path: ${nodes.length} nodes need ${nodes.length - 1} relationships, got ${rels.length}")

      var bound = pm.scan(nodes.head.v, nodes.head.labels)
      nodes.zip(nodes.tail).zip(rels).foreach { case ((from, to), (relVar, types, dir, varLen)) =>
        val hopped = (varLen, dir) match {
          case (None, Out) => pm.expand(bound, from.v, to.v, types, relVar)
          case (None, In) =>
            val h = flippedPm.expand(bound, from.v, to.v, types, relVar)
            relVar.fold(h)(rv => unflip(h, rv))
          case (None, Both) => // bag union minus the double-counted self-loop binding
            val fwd = pm.expand(bound, from.v, to.v, types, relVar)
            val bwd = flippedNoSelf.expand(bound, from.v, to.v, types, relVar)
            fwd.unionByName(relVar.fold(bwd)(rv => unflip(bwd, rv)))
          // var-length hops: intermediate nodes are unconstrained (Cypher —
          // labels apply to endpoints only); relationship uniqueness is by
          // edge id, which every view below preserves
          case (Some((lo, hi)), Out) =>
            pm.expandVarLength(bound, from.v, to.v, types, lo, hi)
          case (Some((lo, hi)), In) =>
            flippedPm.expandVarLength(bound, from.v, to.v, types, lo, hi)
          case (Some((lo, hi)), Both) =>
            // each hop may traverse either orientation: run over the
            // symmetrized edge view (id preserved, so uniqueness still
            // blocks re-walking a relationship in the other direction;
            // self-loops stay single — the flipped branch excludes them)
            val undir = pm.copy(edges = pm.edges.unionByName(flippedNoSelf.edges))
            undir.expandVarLength(bound, from.v, to.v, types, lo, hi)
        }
        bound = labelFilter(hopped, to)
      }
      PathPlan(bound, nodes.map(_.v).toSet, rels.flatMap(_._1).toSet)
    }

    // ---- running query-part state (advances across WITH boundaries) ----
    var bound: DataFrame = null
    var nodeVars = Set.empty[String]
    var relVars = Set.empty[String]
    var scalarCols = Set.empty[String] // aliases a WITH introduced

    /** `v.prop` / `type(r)` / `startNode(r)` / `endNode(r)` / WITH-alias
      * → in-flight column, against the GIVEN bindings (the current part's
      * by default; an OPTIONAL MATCH WHERE resolves against the optional
      * plan's own bindings instead).
      */
    def resolveRefIn(nv: Set[String], rv: Set[String], sc: Set[String])(s: String): Option[(Column, String)] = s.trim match {
      case propRe(v, p) =>
        if (!nv.contains(v) && !rv.contains(v))
          throw ParseError(s"unknown variable '$v'")
        Some((col(s"${v}_$p"), s"${v}_$p"))
      case funcRe(f, r) =>
        if (!rv.contains(r)) throw ParseError(s"'$f' expects a relationship variable, got '$r'")
        val c = f.toLowerCase match {
          case "type" => s"${r}_rel_type"
          case "startnode" => s"${r}_src"
          case "endnode" => s"${r}_dst"
        }
        Some((col(c), c))
      case name if sc.contains(name) => Some((col(name), name))
      case _ => None
    }
    def resolveRef(s: String): Option[(Column, String)] =
      resolveRefIn(nodeVars, relVars, scalarCols)(s)
    def ref(s: String): Column =
      resolveRef(s).getOrElse(throw ParseError(s"unsupported expression '$s'"))._1

    // comma-separated paths combine like the reference's CartesianProduct
    // planning (MemOperatorProducer.scala:115-118): disjoint → cross join;
    // shared node variables → equi-join on every shared binding column
    // (id equality implies the rest — the using-join also dedups columns).
    // A follow-up MATCH after WITH folds into the carried bindings the same
    // way: variables kept by the WITH join, fresh patterns cross.
    def merge(acc: PathPlan, p: PathPlan): PathPlan = {
      if ((acc.relVars intersect p.relVars).nonEmpty)
        throw ParseError(s"relationship variable reused across paths: ${(acc.relVars intersect p.relVars).mkString(", ")}")
      if ((acc.nodeVars intersect p.nodeVars).isEmpty)
        PathPlan(acc.df.crossJoin(p.df), acc.nodeVars ++ p.nodeVars, acc.relVars ++ p.relVars)
      else {
        val shared = acc.nodeVars intersect p.nodeVars
        // join on the shared ids only — id equality implies the rest of
        // the binding (same graph), and id-only keys keep the shuffle from
        // hashing wide rows and array (labels) columns. The incoming
        // side's duplicate non-id shared columns are dropped AFTER its own
        // label filters already applied.
        val idCols = shared.map(v => s"${v}_id").toSeq
        val dup = p.df.columns
          .filter(c => shared.exists(v => c.startsWith(s"${v}_")) && !idCols.contains(c))
        PathPlan(acc.df.join(p.df.drop(dup.toSeq: _*), idCols),
          acc.nodeVars ++ p.nodeVars, acc.relVars ++ p.relVars)
      }
    }

    def applyMatch(patternStr: String): Unit = {
      val plans = pathStr2Paths(patternStr).map(planPath)
      val combined =
        if (bound == null) plans.reduceLeft(merge)
        else plans.foldLeft(PathPlan(bound, nodeVars, relVars))(merge)
      bound = combined.df; nodeVars = combined.nodeVars; relVars = combined.relVars
    }

    // WHERE: OR of AND-conjunctions (AND binds tighter, standard precedence;
    // reference evaluates flat Ands/Ors lists the same way,
    // CypherMapOps.scala:74-80). After a WITH it filters the projection —
    // HAVING when the WITH aggregated.
    def whereCol(w: String, refFn: String => Column): Column =
      splitOn(w, "OR").map { d =>
        splitOn(d, "AND").map(parseCond(_, refFn, params)).reduce(_ && _)
      }.reduce(_ || _)
    def applyWhere(w: String): Unit = bound = bound.where(whereCol(w, ref))

    // ---- OPTIONAL MATCH: plan the pattern like a MATCH, hold it until the
    // next clause (its own WHERE filters the optional plan PRE-join), then
    // LEFT-outer-join onto the bound rows on the shared node ids (the
    // reference plans optional parts onto LeftOuterJoin,
    // impl/planning/BinaryOperator.scala:58-60) ----
    var pendingOpt: Option[PathPlan] = None
    def beginOptional(patternStr: String): Unit = {
      if (bound == null) throw ParseError("OPTIONAL MATCH must follow a MATCH part")
      pendingOpt = Some(pathStr2Paths(patternStr).map(planPath).reduceLeft(merge))
    }
    def whereOptional(w: String): Unit = pendingOpt = pendingOpt.map { p =>
      val optRef: String => Column = s =>
        resolveRefIn(p.nodeVars, p.relVars, Set.empty)(s)
          .getOrElse(throw ParseError(s"unsupported expression '$s' (an OPTIONAL MATCH WHERE sees only the optional pattern's variables)"))._1
      p.copy(df = p.df.where(whereCol(w, optRef)))
    }
    def flushOptional(): Unit = pendingOpt.foreach { p =>
      val shared = nodeVars intersect p.nodeVars
      if (shared.isEmpty)
        throw ParseError("OPTIONAL MATCH must share at least one bound node variable with the preceding part")
      if ((relVars intersect p.relVars).nonEmpty)
        throw ParseError(s"relationship variable reused across paths: ${(relVars intersect p.relVars).mkString(", ")}")
      val idCols = shared.map(v => s"${v}_id").toSeq
      val dup = p.df.columns
        .filter(c => shared.exists(v => c.startsWith(s"${v}_")) && !idCols.contains(c))
      bound = bound.join(p.df.drop(dup.toSeq: _*), idCols, "left")
      nodeVars ++= p.nodeVars; relVars ++= p.relVars
      pendingOpt = None
    }

    // ---- WITH / RETURN projection: plain refs, bare variables (splat),
    // aggregates with Cypher's implicit grouping ----
    sealed trait Item { def c: Column; def name: String }
    case class Plain(c: Column, name: String) extends Item
    case class AggItem(c: Column, name: String) extends Item

    def parseAgg(fn: String, inner: String, alias: Option[String]): AggItem = {
      val f = fn.toLowerCase
      val innerMasked = maskedUpper(inner)
      (f, inner.trim) match {
        case ("count", "*") => AggItem(count(lit(1)).as(alias.getOrElse("count_all")), alias.getOrElse("count_all"))
        case ("count", x) if innerMasked.startsWith("DISTINCT ") =>
          val (c, n) = resolveRef(x.substring("DISTINCT ".length))
            .getOrElse(throw ParseError(s"unsupported aggregate argument '$x'"))
          val name = alias.getOrElse(s"count_distinct_$n")
          AggItem(countDistinct(c).as(name), name)
        case (_, x) =>
          val (c, n) = resolveRef(x).getOrElse(throw ParseError(s"unsupported aggregate argument '$x'"))
          val name = alias.getOrElse(s"${f}_$n")
          val e = f match {
            case "count" => count(c)
            case "min" => min(c)
            case "max" => max(c)
            case "sum" => sum(c)
            // the engine's deterministic collect (order-pinned, like q06)
            case "collect" => sort_array(collect_list(c))
          }
          AggItem(e.as(name), name)
      }
    }

    /** Project `body` over the in-flight table. For WITH this also REPLACES
      * the binding state: bare variables carry forward, everything else must
      * be aliased (openCypher's rule for WITH) and becomes a plain column.
      */
    def project(body: String, isWith: Boolean): DataFrame = {
      val clauseName = if (isWith) "WITH" else "RETURN"
      val distinct = maskedUpper(body).startsWith("DISTINCT ")
      val itemsStr = if (distinct) body.substring("DISTINCT ".length) else body
      var keptNodes = Set.empty[String]
      var keptRels = Set.empty[String]
      var newScalars = Set.empty[String]
      val items: Seq[Item] = itemsStr.split(",").map(_.trim).toSeq.flatMap { it =>
        val parts = splitOn(it, "AS")
        val (expr, alias) = (parts.head.trim, if (parts.length > 1) Some(parts(1).trim) else None)
        expr match {
          case aggRe(fn, inner) =>
            if (isWith && alias.isEmpty)
              throw ParseError(s"expressions in WITH must be aliased: '$it'")
            val a = parseAgg(fn, inner, alias)
            newScalars += a.name
            Seq(a)
          case _ => resolveRef(expr) match {
            case Some((c, n)) =>
              // a bare WITH-alias passes through under its own name; any
              // other expression in WITH needs an explicit alias
              if (isWith && alias.isEmpty && !scalarCols.contains(expr))
                throw ParseError(s"expressions in WITH must be aliased: '$it'")
              val name = alias.getOrElse(n)
              newScalars += name
              Seq(Plain(c.as(name), name))
            case None if nodeVars.contains(expr) || relVars.contains(expr) =>
              // bare variable: splat its columns; in WITH it stays bound
              if (alias.isDefined) throw ParseError(s"AS on a bare variable '$expr' is not supported")
              if (nodeVars.contains(expr)) keptNodes += expr else keptRels += expr
              bound.columns.filter(_.startsWith(s"${expr}_")).toSeq.map(c => Plain(col(c), c))
            case None => throw ParseError(s"unsupported $clauseName item '$expr'")
          }
        }
      }
      if (items.isEmpty) throw ParseError(s"$clauseName needs at least one item")

      val aggs = items.collect { case a: AggItem => a }
      val out =
        if (aggs.isEmpty) {
          val o = bound.select(items.map(_.c): _*)
          if (distinct) o.distinct() else o
        } else {
          // Cypher's implicit grouping: non-aggregated items are the keys
          if (distinct) throw ParseError("DISTINCT with aggregates is not in the supported fragment")
          val keys = items.collect { case p: Plain => p.c }
          bound.groupBy(keys: _*).agg(aggs.head.c, aggs.tail.map(_.c): _*)
            // restore the written item order (groupBy puts keys first)
            .select(items.map(i => col(i.name)): _*)
        }
      if (isWith) { nodeVars = keptNodes; relVars = keptRels; scalarCols = newScalars }
      out
    }

    def parseLimit(raw0: String): Int = {
      val raw = raw0.trim
      val resolved = if (raw.startsWith("$")) param(params, raw.substring(1)) else raw
      try resolved.toString.trim.toInt
      catch { case _: NumberFormatException => throw ParseError(s"LIMIT expects an integer, got '$raw'") }
    }

    // ---- drive the clause chain (ordering validated as we go) ----
    var returnBody: String = null
    var orderBody: Option[String] = None
    var limitN: Option[Int] = None
    var last = "" // previous clause: "", MATCH, MATCH-WHERE, WITH, WITH-WHERE, RETURN, ORDER BY
    clauses.foreach { cl =>
      (cl.kw, last) match {
        case ("MATCH", "" | "WITH" | "WITH-WHERE") => applyMatch(cl.body)
        case ("MATCH", _) =>
          throw ParseError("MATCH may only start the query or follow a WITH (consecutive MATCH clauses: use comma-separated patterns; after an OPTIONAL MATCH, Cypher itself forbids a plain MATCH)")
        case ("OPTIONAL MATCH", "MATCH" | "MATCH-WHERE" | "OPT" | "OPT-WHERE" | "WITH" | "WITH-WHERE") =>
          flushOptional(); beginOptional(cl.body)
        case ("OPTIONAL MATCH", _) =>
          throw ParseError("OPTIONAL MATCH must follow a MATCH, OPTIONAL MATCH or WITH part")
        case ("WHERE", "MATCH" | "WITH") => applyWhere(cl.body)
        case ("WHERE", "OPT") => whereOptional(cl.body)
        case ("WHERE", _) => throw ParseError("WHERE must directly follow MATCH, OPTIONAL MATCH or WITH")
        case ("WITH", "MATCH" | "MATCH-WHERE" | "OPT" | "OPT-WHERE" | "WITH" | "WITH-WHERE") =>
          flushOptional(); bound = project(cl.body, isWith = true)
        case ("WITH", _) => throw ParseError("WITH must follow a MATCH or WITH part")
        case ("RETURN", "MATCH" | "MATCH-WHERE" | "OPT" | "OPT-WHERE" | "WITH" | "WITH-WHERE") =>
          flushOptional(); returnBody = cl.body
        case ("RETURN", _) => throw ParseError("RETURN must close a MATCH or WITH part")
        case ("ORDER BY", "RETURN") => orderBody = Some(cl.body)
        case ("ORDER BY", _) =>
          throw ParseError("ORDER BY is only supported after RETURN (the reference blacklists ORDER BY inside WITH)")
        case ("LIMIT", "RETURN" | "ORDER BY") => limitN = Some(parseLimit(cl.body))
        case ("LIMIT", _) => throw ParseError("LIMIT is only supported at the end of the query")
      }
      last = if (cl.kw == "WHERE") s"$last-WHERE" else if (cl.kw == "OPTIONAL MATCH") "OPT" else cl.kw
    }

    var out = project(returnBody, isWith = false)

    // ---- ORDER BY ----
    orderBody.foreach { o =>
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

  /** Split the MATCH clause into its comma-separated paths (no commas occur
    * inside the node/rel syntax of the fragment).
    */
  private def pathStr2Paths(patternStr: String): List[String] = {
    val paths = patternStr.split(",").map(_.trim).filter(_.nonEmpty).toList
    if (paths.isEmpty) throw ParseError("empty MATCH pattern")
    paths
  }

  private def param(params: Map[String, Any], name: String): Any =
    params.getOrElse(name, throw ParseError(s"missing parameter $$$name"))

  private def parseCond(s: String, ref: String => Column,
      params: Map[String, Any]): Column = {
    val notNullRe = """(?i)(.+?)\s+IS\s+NOT\s+NULL\s*""".r
    val nullRe = """(?i)(.+?)\s+IS\s+NULL\s*""".r
    val cmpRe = """(.+?)\s*(<=|>=|<>|=|<|>)\s*(.+)""".r
    s match {
      case notNullRe(l) => ref(l).isNotNull
      case nullRe(l) => ref(l).isNull
      case cmpRe(lhs, op, rhs) =>
        val c = ref(lhs)
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
