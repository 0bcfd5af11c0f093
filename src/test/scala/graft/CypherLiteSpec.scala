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

  test("label conjunction and IS NOT NULL") {
    val res = CypherLite.run(people,
      "MATCH (n:Person:Moderator) WHERE n.city IS NOT NULL RETURN n.name AS name")
      .as[String].collect().toSeq
    assert(res == Seq("Dave"))
  }

  test("unsupported fragments are rejected with clear errors") {
    def rejected(q: String): Unit =
      assertThrows[CypherLite.ParseError](CypherLite.run(chain, q))
    rejected("OPTIONAL MATCH (n) RETURN n")
    rejected("MATCH (n)-[*1..2]->(m) RETURN n")
    rejected("MATCH (n)--(m) RETURN n")
    rejected("MATCH (n)<--(m) RETURN n")
    rejected("MATCH (n), (m) RETURN n")
    rejected("MATCH (n) WHERE n.a = 1 OR n.b = 2 RETURN n")
    rejected("MATCH (n) RETURN n SKIP 2")
    rejected("CREATE (n) RETURN n")
  }
}
