package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set
  *    against the full corpus; the corpus never shuffles, ranking is a
  *    per-query window over candidate rows. Baseline + verifier.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries are bucketed by
  *    an r-bit signature (deterministic pseudo-random planes derived from a
  *    seed, shipped as literals); only same-bucket pairs are scored, with
  *    multi-probe (all buckets at Hamming distance ≤ 1) to recover boundary
  *    losses. The scale path: candidate volume ∝ corpus/2^r per query.
  */
object SimilaritySearch {
  import graft.functions.VectorOps.{asDouble, cosine, dot => dotD}

  /** Exact top-k neighbors for each query row. Queries must be small enough
    * to broadcast (typical: a probe batch). Returns
    * (query_id, neighbor_id, rank) — ranks only, no float columns, so
    * results are engine-comparable.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic ±1 hyperplanes: plane r, component i = sign of a hash. */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] =
    (0 until numPlanes).map(r => (0 until dim).map(i =>
      if ((Hashing.mix(seed, "plane", r, i) & 1L) == 0L) 1.0 else -1.0))

  /** r-bit signature column for a double-array vector column. */
  def lshSignature(vec: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(numPlanes, dim, seed)
    ps.zipWithIndex.map { case (p, r) =>
      val planeLit = array(p.map(lit): _*)
      when(dotD(vec, planeLit) >= 0, shiftleft(lit(1L), r)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k via LSH buckets with Hamming≤1 multi-probe.
    * Returns (query_id, neighbor_id, rank) for found candidates (approximate:
    * a query may return < k rows if its probed buckets are sparse).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      k: Int, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshSignature(col("cv"), numPlanes, dim, seed))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("sig", lshSignature(col("qv"), numPlanes, dim, seed))
    // multi-probe: the exact bucket plus all single-bit flips (unrolled —
    // shift amounts must be Scala Ints)
    val probes = explode(array(col("sig") +:
      (0 until numPlanes).map(r => col("sig").bitwiseXOR(lit(1L << r))): _*))
    val q = q0.withColumn("bucket", probes)
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
