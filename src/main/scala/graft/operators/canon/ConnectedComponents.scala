package graft.operators.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge table via the alternating
  * large-star / small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14) expressed as Dataset self-joins —
  * O(log n) rounds, no driver-side graph, no GraphX/RDD.
  *
  * Scale notes (SURVEY.md §7.6(1)):
  *  - the min-neighbor computation is a `groupBy(...).agg(min(...))` —
  *    partial-aggregable, so map-side combine absorbs hub-key skew before any
  *    shuffle (a 10⁸-degree hub contributes one row per input partition);
  *  - the propagate join re-keys on node id; AQE skew-join splitting is on
  *    in the session so a hot post-agg join key is split at runtime;
  *  - each round persists + cuts lineage (the plans would otherwise grow
  *    exponentially across iterations and re-execute from the source).
  *
  * Replaces the reference's driver-side entity clustering (the reference has
  * none — its graph is built fully materialized in memory,
  * api/MemCypherGraph.scala:36-39; canonicalization is our pipeline's
  * addition per BASELINE.json north_star).
  */
object ConnectedComponents {

  /** @param edges DataFrame with long columns (src, dst), undirected.
    * @return DataFrame (id: Long, component: Long); component = min id in the
    *         node's component. Every id occurring in edges appears exactly once.
    */
  def run(edges: DataFrame, maxIter: Int = 40): DataFrame = {
    val spark = edges.sparkSession
    var e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    var prevSig = signature(e)
    while (!converged && iter < maxIter) {
      // one materialization per round: localCheckpoint(eager) computes the
      // large-star∘small-star composition AND truncates lineage so round N's
      // plan doesn't embed rounds 0..N-1 (at cluster scale: reliable
      // checkpoint dir instead).
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val sig = signature(next)
      converged = sig == prevSig
      prevSig = sig
      e.unpersist(false)
      e = next
      iter += 1
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        System.err.println(s"[cc] round $iter edges=${sig._1} converged=$converged")
    }
    // At the fixpoint every edge points from a node to its component min.
    val stars = e.select(col("src").as("id"), col("dst").as("component"))
    val roots = e.select(col("dst").as("id")).distinct()
      .withColumn("component", col("id"))
    stars.unionByName(roots)
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Convenience: include isolated vertices from a full vertex list. */
  def runWithVertices(vertices: DataFrame, edges: DataFrame, maxIter: Int = 40): DataFrame = {
    val comp = run(edges, maxIter)
    vertices.select(col("id").cast("long"))
      .distinct()
      .join(comp, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Order-independent convergence signature: (edge count, xor/sum of edge
    * hashes). Collision probability negligible vs re-running one extra round.
    */
  private def signature(e: DataFrame): (Long, String) = {
    // decimal sum: ANSI mode (Spark 4 default) would overflow a LongType sum
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h")
    ).head()
    (row.getLong(0), String.valueOf(row.get(1)))
  }

  /** large-star: connect every strictly-larger neighbor of u to u's min
    * neighborhood element m(u) = min(N(u) ∪ {u}).
    *
    * No distinct here: duplicates only inflate small-star's input by a
    * bounded factor (each sym row emits ≤ 1 row) and small-star's final
    * distinct dedups anyway — one shuffle per round instead of two.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src"), col("dst"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("mn"), col("src")).as("m"))
    sym.join(mins, "src")
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
  }

  /** small-star: for each u, link all ≤-neighbors (and u) to the min. */
  private def smallStar(e: DataFrame): DataFrame = {
    val directed = e.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    val mins = directed.groupBy("src").agg(min(col("dst")).as("m"))
    directed.join(mins, "src")
      .select(explode(array(col("dst"), col("src"))).as("v"), col("m"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }
}
