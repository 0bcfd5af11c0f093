package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.{CypherLite, PatternMatch}

/** The reference's string-query surface, on its own test queries:
  * MatchAcceptanceTest.scala:19-26 (chain graph, `MATCH (n)-->(a)-->(b)
  * RETURN b`) and apps/Demo.scala:31-42 (`MATCH (n:Person) RETURN n.city,
  * n.age ORDER BY n.city ASC, n.age DESC`), plus the WHERE/DISTINCT/LIMIT
  * fragment and the pinned rejections.
  */
class CypherLiteSpec extends SparkTestBase {
  import spark.implicits._

  // chain fixture: CREATE (a:A {value:1})-[:KNOWS]->(b:B {value:2})-[:FRIEND]->(c:C {value:3})
  private lazy val chain = PatternMatch(
    Seq((1L, Seq("A"), 1), (2L, Seq("B"), 2), (3L, Seq("C"), 3)).toDF("id", "labels", "value"),
    Seq((10L, 1L, 2L, "KNOWS"), (11L, 2L, 3L, "FRIEND")).toDF("id", "src", "dst", "rel_type"))

  private lazy val people = PatternMatch(
    Seq(
      (0L, Seq("Person"), "Alice", "Leipzig", 20),
      (1L, Seq("Person"), "Bob", "Leipzig", 30),
      (2L, Seq("Person"), "Carol", "Dresden", 30),
      (3L, Seq("Person", "Moderator"), "Dave", "Dresden", 40),
      (4L, Seq("Tag"), "Databases", "", 0)
    ).toDF("id", "labels", "name", "city", "age"),
    Seq((10L, 0L, 1L, "KNOWS"), (11L, 2L, 3L, "KNOWS")).toDF("id", "src", "dst", "rel_type"))

  test("MatchAcceptanceTest query: MATCH (n)-->(a)-->(b) RETURN b") {
    val res = CypherLite.run(chain, "MATCH (n)-->(a)-->(b) RETURN b")
    assert(res.columns.toSet == Set("b_id", "b_labels", "b_value"))
    assert(res.select("b_value").as[Int].collect().toSeq == Seq(3))
  }

  test("Demo query: MATCH (n:Person) RETURN n.city, n.age ORDER BY n.city ASC, n.age DESC") {
    val res = CypherLite.run(people,
      """MATCH (n:Person)
        |RETURN n.city, n.age
        |ORDER BY n.city ASC, n.age DESC""".stripMargin)
      .as[(String, Int)].collect().toSeq
    assert(res == Seq(("Dresden", 40), ("Dresden", 30), ("Leipzig", 30), ("Leipzig", 20)))
  }

  test("typed expand + WHERE + DISTINCT + AS + LIMIT") {
    val res = CypherLite.run(people,
      "MATCH (n:Person)-[:KNOWS]->(m) WHERE n.age >= 20 AND m.city = 'Dresden' " +
        "RETURN DISTINCT n.name AS who, m.name AS knows ORDER BY who LIMIT 5")
      .as[(String, String)].collect().toSeq
    assert(res == Seq(("Carol", "Dave")))
  }

  test("var-length *1..2 walks the chain (string surface of expandVarLength)") {
    val res = CypherLite.run(chain, "MATCH (n:A)-[*1..2]->(b) RETURN b.value")
      .as[Int].collect().toSeq.sorted
    assert(res == Seq(2, 3))
  }

  test("var-length with type alternation restricts the walked edge set") {
    val res = CypherLite.run(chain,
      "MATCH (n:A)-[:KNOWS|FRIEND*1..2]->(b) RETURN b.value")
      .as[Int].collect().toSeq.sorted
    assert(res == Seq(2, 3))
    val onlyKnows = CypherLite.run(chain,
      "MATCH (n:A)-[:KNOWS*1..2]->(b) RETURN b.value").as[Int].collect().toSeq
    assert(onlyKnows == Seq(2))
  }

  test("type alternation on a fixed hop: -[:KNOWS|FRIEND]->") {
    val res = CypherLite.run(chain,
      "MATCH (n)-[:KNOWS|FRIEND]->(m) RETURN m.value").as[Int].collect().toSeq.sorted
    assert(res == Seq(2, 3))
  }

  test("var-length reverse and undirected arrows") {
    val rev = CypherLite.run(chain, "MATCH (n:C)<-[*1..2]-(b) RETURN b.value")
      .as[Int].collect().toSeq.sorted
    assert(rev == Seq(1, 2))
    // undirected 2-hop from A: A-B then B-C forward, B-A blocked by
    // relationship uniqueness (same edge id in the flipped view)
    val undir = CypherLite.run(chain, "MATCH (n:A)-[*2..2]-(b) RETURN b.value")
      .as[Int].collect().toSeq
    assert(undir == Seq(3))
  }

  test("var-length rejections: unbounded, no upper bound, rel var, min>max") {
    for (q <- Seq(
      "MATCH (n)-[*]->(b) RETURN b.value",
      "MATCH (n)-[*2..]->(b) RETURN b.value",
      "MATCH (n)-[r:KNOWS*1..2]->(b) RETURN b.value",
      "MATCH (n)-[*3..2]->(b) RETURN b.value"))
      intercept[CypherLite.ParseError] { CypherLite.run(chain, q) }
  }

  test("label conjunction and IS NOT NULL") {
    val res = CypherLite.run(people,
      "MATCH (n:Person:Moderator) WHERE n.city IS NOT NULL RETURN n.name AS name")
      .as[String].collect().toSeq
    assert(res == Seq("Dave"))
  }

  test("reverse arrow desugars to the flipped expand: MATCH (b)<--(a)") {
    // chain: 1-KNOWS->2-FRIEND->3; reversed 2-hop walks it backwards
    val res = CypherLite.run(chain, "MATCH (b)<--(a)<--(n) RETURN b.value AS v")
      .as[Int].collect().toSeq
    assert(res == Seq(3))
    val one = CypherLite.run(chain, "MATCH (m)<-[:KNOWS]-(n) RETURN m.value AS v")
      .as[Int].collect().toSeq
    assert(one == Seq(2))
  }

  test("undirected hop matches each relationship once per direction binding") {
    // (n)--(m) over 2 relationships ⇒ 4 rows (Cypher bag semantics)
    val res = CypherLite.run(people, "MATCH (n)-[:KNOWS]-(m) RETURN n.name AS n, m.name AS m")
      .as[(String, String)].collect().toSet
    assert(res == Set(("Alice", "Bob"), ("Bob", "Alice"), ("Carol", "Dave"), ("Dave", "Carol")))
    assert(CypherLite.run(people, "MATCH (n)--(m) RETURN n.name AS n").count() == 4)
  }

  test("label constraints on non-head pattern nodes are applied") {
    // (n)-[:KNOWS]->(m:Moderator): only Carol→Dave lands on a Moderator
    val res = CypherLite.run(people, "MATCH (n)-[:KNOWS]->(m:Moderator) RETURN n.name AS n, m.name AS m")
      .as[(String, String)].collect().toSet
    assert(res == Set(("Carol", "Dave")))
    // and on the source side of a reverse arrow
    val rev = CypherLite.run(people, "MATCH (m)<-[:KNOWS]-(n:Moderator) RETURN n.name AS n")
      .as[String].collect().toSeq
    assert(rev == Seq())
  }

  test("OR in WHERE, AND binds tighter (reference Ors, CypherMapOps.scala:78-80)") {
    val res = CypherLite.run(people,
      "MATCH (n:Person) WHERE n.city = 'Leipzig' AND n.age > 25 OR n.name = 'Dave' " +
        "RETURN n.name AS name ORDER BY name")
      .as[String].collect().toSeq
    assert(res == Seq("Bob", "Dave")) // (Leipzig AND >25) OR Dave — not Leipzig AND (…OR…)
  }

  test("parameters substitute as typed literals (reference Param, CypherMapOps.scala:39-41)") {
    val res = CypherLite.run(people,
      "MATCH (n:Person) WHERE n.age >= $minAge AND n.city = $city RETURN n.name AS name LIMIT $k",
      Map("minAge" -> 30, "city" -> "Dresden", "k" -> 1))
      .as[String].collect().toSeq
    assert(res.length == 1 && Set("Carol", "Dave").contains(res.head))
    assertThrows[CypherLite.ParseError](CypherLite.run(people,
      "MATCH (n) WHERE n.age > $missing RETURN n.name"))
  }

  test("keywords inside identifiers or string literals don't split clauses") {
    // 'skip'/'with' as property-name substrings must not trip the rejection
    val skippy = PatternMatch(
      Seq((1L, Seq("A"), 7)).toDF("id", "labels", "skipCount"),
      Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "rel_type"))
    assert(CypherLite.run(skippy, "MATCH (n:A) RETURN n.skipCount AS c")
      .as[Int].collect().toSeq == Seq(7))
    // ' OR ' and ' LIMIT ' inside a string literal are data, not clauses
    val res = CypherLite.run(people,
      "MATCH (n) WHERE n.name = 'x OR y LIMIT 1' OR n.name = 'Alice' RETURN n.name AS name")
      .as[String].collect().toSeq
    assert(res == Seq("Alice"))
  }

  test("relationship variables bind with storage orientation (reference CypherMapOps.scala:43-45)") {
    // forward: r's columns surface as r_*; type(r) == r.rel_type
    val fwd = CypherLite.run(people,
      "MATCH (n)-[r:KNOWS]->(m) WHERE n.name = 'Alice' " +
        "RETURN r.id AS rid, type(r) AS t, startNode(r) AS s, endNode(r) AS e")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(fwd == Seq((10L, "KNOWS", 0L, 1L)))
    // reverse arrow: startNode/endNode still report the STORED endpoints
    val rev = CypherLite.run(people,
      "MATCH (m)<-[r:KNOWS]-(n) WHERE n.name = 'Alice' " +
        "RETURN startNode(r) AS s, endNode(r) AS e")
      .as[(Long, Long)].collect().toSeq
    assert(rev == Seq((0L, 1L)))
    // rel functions usable in WHERE; bare `r` splats its columns
    assert(CypherLite.run(people,
      "MATCH (n)-[r]->(m) WHERE type(r) = 'KNOWS' RETURN r").count() == 2)
  }

  test("aggregating RETURN groups by the non-aggregated items (reference MemCypherRecords.scala:99-162)") {
    val res = CypherLite.run(people,
      "MATCH (n:Person) RETURN n.city AS city, count(*) AS n, min(n.name) AS first ORDER BY city")
      .as[(String, Long, String)].collect().toSeq
    assert(res == Seq(("Dresden", 2L, "Carol"), ("Leipzig", 2L, "Alice")))
    val coll = CypherLite.run(people,
      "MATCH (n:Person) RETURN n.city AS city, collect(n.name) AS names ORDER BY city")
      .as[(String, Seq[String])].collect().toSeq
    assert(coll == Seq(("Dresden", Seq("Carol", "Dave")), ("Leipzig", Seq("Alice", "Bob"))))
    // global aggregate (no keys) + count DISTINCT + default naming
    val g = CypherLite.run(people, "MATCH (n:Person) RETURN count(DISTINCT n.city), sum(n.age)")
    assert(g.columns.toSeq == Seq("count_distinct_n_city", "sum_n_age"))
    assert(g.as[(Long, Long)].collect().toSeq == Seq((2L, 120L)))
  }

  test("multi-pattern MATCH: shared variables join, disjoint patterns cross (reference MemOperatorProducer.scala:115-118)") {
    val shared = CypherLite.run(chain,
      "MATCH (n)-[:KNOWS]->(a), (a)-[:FRIEND]->(b) RETURN b.value AS v")
      .as[Int].collect().toSeq
    assert(shared == Seq(3))
    val cross = CypherLite.run(chain, "MATCH (n:A), (m:C) RETURN n.value AS nv, m.value AS mv")
      .as[(Int, Int)].collect().toSeq
    assert(cross == Seq((1, 3)))
  }

  test("undirected self-loop matches exactly once (both direction bindings are the same binding)") {
    val loopy = PatternMatch(
      Seq((1L, Seq("A"), 1), (2L, Seq("A"), 2)).toDF("id", "labels", "value"),
      Seq((10L, 1L, 1L, "SELF"), (11L, 1L, 2L, "LINK")).toDF("id", "src", "dst", "rel_type"))
    assert(CypherLite.run(loopy, "MATCH (a)-[:SELF]-(b) RETURN a.value AS v").count() == 1)
    // non-loop relationships still match once per direction binding
    assert(CypherLite.run(loopy, "MATCH (a)-[:LINK]-(b) RETURN a.value AS v").count() == 2)
  }

  test("whitespace inside string literals is preserved; quote escapes are rejected") {
    val spacey = PatternMatch(
      Seq((1L, Seq("A"), "x  y")).toDF("id", "labels", "name"),
      Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "rel_type"))
    // the double space inside the literal must survive normalization
    assert(CypherLite.run(spacey, "MATCH (n) WHERE n.name = 'x  y' RETURN n.name AS name")
      .as[String].collect().toSeq == Seq("x  y"))
    assertThrows[CypherLite.ParseError](CypherLite.run(spacey,
      """MATCH (n) WHERE n.name = 'O\'Brien' RETURN n.name"""))
    assertThrows[CypherLite.ParseError](CypherLite.run(spacey,
      "MATCH (n) WHERE n.name = 'O''Brien' RETURN n.name"))
  }

  test("WITH projects and aliases; a following WHERE filters the projection (TCK WithAcceptance shapes)") {
    // plain projection + aliasing, referenced by alias afterwards
    val res = CypherLite.run(people,
      "MATCH (n:Person) WITH n.name AS name, n.age AS age WHERE age > 25 " +
        "RETURN name, age ORDER BY name")
      .as[(String, Int)].collect().toSeq
    assert(res == Seq(("Bob", 30), ("Carol", 30), ("Dave", 40)))
    // DISTINCT in WITH
    assert(CypherLite.run(people,
      "MATCH (n:Person) WITH DISTINCT n.city AS city RETURN city").count() == 2)
  }

  test("WITH aggregates with implicit grouping; post-WITH WHERE is HAVING") {
    val res = CypherLite.run(people,
      "MATCH (n:Person) WITH n.city AS city, count(*) AS n_people, max(n.age) AS oldest " +
        "WHERE n_people >= 2 AND oldest >= 40 RETURN city, n_people")
      .as[(String, Long)].collect().toSeq
    assert(res == Seq(("Dresden", 2L)))
    // aggregate over a WITH alias in the final RETURN
    val two = CypherLite.run(people,
      "MATCH (n:Person) WITH n.city AS city RETURN count(DISTINCT city) AS n_cities")
      .as[Long].collect().toSeq
    assert(two == Seq(2L))
  }

  test("WITH passes bound nodes into a follow-up MATCH (shared variable joins)") {
    // chain 1-KNOWS->2-FRIEND->3: carry the KNOWS target, expand FRIEND
    val res = CypherLite.run(chain,
      "MATCH (n)-[:KNOWS]->(a) WITH a MATCH (a)-[:FRIEND]->(b) RETURN a.value AS av, b.value AS bv")
      .as[(Int, Int)].collect().toSeq
    assert(res == Seq((2, 3)))
    // scalar aliases ride along across the second MATCH
    val ride = CypherLite.run(chain,
      "MATCH (n)-[:KNOWS]->(a) WITH a, n.value AS nv MATCH (a)-[:FRIEND]->(b) " +
        "RETURN nv, b.value AS bv")
      .as[(Int, Int)].collect().toSeq
    assert(ride == Seq((1, 3)))
    // a follow-up MATCH sharing no variable crosses (reference CartesianProduct)
    val cross = CypherLite.run(chain,
      "MATCH (n:A) WITH n.value AS nv MATCH (m:C) RETURN nv, m.value AS mv")
      .as[(Int, Int)].collect().toSeq
    assert(cross == Seq((1, 3)))
  }

  test("WITH chains; variables dropped by WITH are unknown afterwards") {
    val res = CypherLite.run(people,
      "MATCH (n:Person) WITH n.city AS city, n.age AS age WITH city, max(age) AS oldest " +
        "RETURN city, oldest ORDER BY city")
      .as[(String, Int)].collect().toSeq
    assert(res == Seq(("Dresden", 40), ("Leipzig", 30)))
    // n is out of scope after a WITH that didn't carry it
    assertThrows[CypherLite.ParseError](CypherLite.run(people,
      "MATCH (n:Person) WITH n.city AS city RETURN n.name"))
    // expressions in WITH must be aliased (openCypher's own rule)
    assertThrows[CypherLite.ParseError](CypherLite.run(people,
      "MATCH (n:Person) WITH n.city RETURN n.city"))
    // ORDER BY inside WITH stays out (the reference blacklists it)
    assertThrows[CypherLite.ParseError](CypherLite.run(people,
      "MATCH (n:Person) WITH n.age AS age ORDER BY age RETURN age"))
  }

  test("OPTIONAL MATCH left-joins; unmatched rows null-pad the optional variables (reference BinaryOperator.scala:58-60)") {
    // every Person row survives; only Alice and Carol have outgoing KNOWS
    val res = CypherLite.run(people,
      "MATCH (n:Person) OPTIONAL MATCH (n)-[:KNOWS]->(m) " +
        "RETURN n.name AS who, m.name AS knows ORDER BY who")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(res == Seq(
      ("Alice", Some("Bob")), ("Bob", None), ("Carol", Some("Dave")), ("Dave", None)))
  }

  test("WHERE after OPTIONAL MATCH filters the optional side PRE-join (Cypher semantics)") {
    // pre-join: Alice keeps her row with a null m (her match was filtered
    // away), instead of being dropped as a post-join WHERE would do
    val res = CypherLite.run(people,
      "MATCH (n:Person) OPTIONAL MATCH (n)-[:KNOWS]->(m) WHERE m.city = 'Dresden' " +
        "RETURN n.name AS who, m.name AS knows ORDER BY who")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(res == Seq(
      ("Alice", None), ("Bob", None), ("Carol", Some("Dave")), ("Dave", None)))
    // the optional WHERE sees only the optional pattern's variables
    assertThrows[CypherLite.ParseError](CypherLite.run(people,
      "MATCH (n:Person) WITH n.name AS who MATCH (x:Tag) " +
        "OPTIONAL MATCH (x)-[:KNOWS]->(m) WHERE who = 'Alice' RETURN who"))
  }

  test("OPTIONAL MATCH pattern may share a non-head variable; chained optionals fold in order") {
    // optional head scans Person, hop lands on the bound m
    val res = CypherLite.run(people,
      "MATCH (m:Person) WHERE m.city = 'Dresden' " +
        "OPTIONAL MATCH (n:Person)-[:KNOWS]->(m) " +
        "RETURN m.name AS who, n.name AS known_by ORDER BY who")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(res == Seq(("Carol", None), ("Dave", Some("Carol"))))
    // a disconnected optional pattern is rejected
    assertThrows[CypherLite.ParseError](CypherLite.run(people,
      "MATCH (n:Person) OPTIONAL MATCH (x:Tag) RETURN n.name AS who"))
  }

  test("UNION ALL is a bag union of full queries (reference TabularUnionAll, BinaryOperator.scala:75-80)") {
    val res = CypherLite.run(people,
      "MATCH (n:Person) WHERE n.city = 'Dresden' RETURN n.name AS name " +
        "UNION ALL MATCH (n:Person) WHERE n.age >= 30 RETURN n.name AS name")
      .as[String].collect().toSeq.sorted
    // Carol and Dave appear in BOTH parts — duplicates preserved
    assert(res == Seq("Bob", "Carol", "Carol", "Dave", "Dave"))
  }

  test("UNION ALL rejections: mismatched columns, bare UNION, ORDER BY/LIMIT inside a part") {
    def rejected(q: String): Unit =
      assertThrows[CypherLite.ParseError](CypherLite.run(people, q))
    rejected("MATCH (n:Person) RETURN n.name AS a UNION ALL MATCH (n:Person) RETURN n.name AS b")
    rejected("MATCH (n:Person) RETURN n.name AS a UNION MATCH (n:Person) RETURN n.name AS a")
    rejected("MATCH (n:Person) RETURN n.name AS a ORDER BY a UNION ALL MATCH (n:Person) RETURN n.name AS a")
    rejected("MATCH (n:Person) RETURN n.name AS a LIMIT 1 UNION ALL MATCH (n:Person) RETURN n.name AS a")
    // ' UNION ALL ' inside a string literal is data, not a separator
    val one = CypherLite.run(people,
      "MATCH (n:Person) WHERE n.name = ' UNION ALL ' RETURN n.name AS a")
    assert(one.count() == 0)
  }

  test("unsupported fragments are rejected with clear errors") {
    def rejected(q: String): Unit =
      assertThrows[CypherLite.ParseError](CypherLite.run(chain, q))
    rejected("OPTIONAL MATCH (n) RETURN n") // must follow a MATCH part
    rejected("MATCH (n)-[*1..]->(m) RETURN n") // var-length must be bounded
    rejected("MATCH (n)-->(n) RETURN n") // repeated variable in one path
    rejected("MATCH (n)-[r]->(m), (m)-[r]->(o) RETURN n") // rel var reuse across paths
    rejected("MATCH (n) RETURN n SKIP 2")
    rejected("CREATE (n) RETURN n")
    rejected("MATCH (n) RETURN n LIMIT five") // non-integer LIMIT → ParseError, not NumberFormat
    rejected("MATCH (n)<-[:KNOWS]->(m) RETURN n") // both arrow heads
    rejected("MATCH (n) RETURN DISTINCT n.name, count(*)") // DISTINCT with aggregates
  }
}
