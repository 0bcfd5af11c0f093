package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling for aggregations whose payload is NOT
  * partial-agg-friendly (collect_list/collect_set state grows with group
  * size, so a hub key funnels its whole group through one reducer).
  *
  * Two-phase salted aggregation: phase 1 groups by (key, salt) where salt is
  * a deterministic hash of the payload (never rand() — resume and retries
  * must reproduce identical results), bounding any single reducer's group to
  * ~1/salts of the hub; phase 2 merges the per-salt partials, whose count is
  * ≤ salts per key. Counts stay exact; collected samples are bounded
  * per-salt then re-bounded on merge (deterministic by sort).
  */
object Salting {

  /** groupBy(keyCols) computing: n_mentions = exact count, sample_conv_ids =
    * deterministic bounded sample of `sampleCols.head` values.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      sampleCols: Seq[String],
      salts: Int,
      samplePerKey: Int): DataFrame = {
    val sampleCol = sampleCols.head
    val salted = df.withColumn("_salt", pmod(xxhash64(col(sampleCol)), lit(salts)))
    val phase1 = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        slice(sort_array(collect_set(col(sampleCol))), 1, samplePerKey).as("_sample"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("_cnt")).as("n_mentions"),
        slice(sort_array(array_distinct(flatten(collect_list(col("_sample"))))), 1, samplePerKey)
          .as("sample_conv_ids"))
  }

  /** Deterministically salted repartition: spreads a hot key's rows across
    * `salts` partitions without changing row content (for downstream
    * per-partition work after a skewed stage).
    */
  def spread(df: DataFrame, salts: Int, contentCols: Seq[String]): DataFrame =
    df.repartition(col(contentCols.head), pmod(xxhash64(contentCols.map(col): _*), lit(salts)))
}
