package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Explicit skew handling for aggregations whose payload is NOT
  * partial-agg-friendly. Exact counts don't need help (map-side combine
  * absorbs hub keys); the dangerous part is collect-style payloads, where a
  * hub key's collected set grows with group size inside the aggregation
  * buffer.
  *
  * Strategy for bounded deterministic samples with bounded memory:
  *  1. distinct (key, sample) — hash-agg with O(1) state per row;
  *  2. deterministic salt = hash(sample) % salts, then a row_number window
  *     per (key, salt) — the window sort is spill-able (sort-based,
  *     disk-backed), so a hub key never holds its group in memory; rank ≤ k;
  *  3. final per-key merge collects ≤ salts × k rows — constant-bounded.
  * Never rand(): salts are content-derived so retries/resume reproduce
  * identical results.
  */
object Salting {

  /** groupBy(keyCols) computing: n_mentions = exact count (plain
    * partial-aggregated count — skew-safe by itself), sample_conv_ids =
    * deterministic bounded sample (smallest `samplePerKey` distinct values
    * of `sampleCol`), plus `minCols` carried as per-key minima.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      sampleCols: Seq[String],
      salts: Int,
      samplePerKey: Int,
      minCols: Seq[String] = Nil): DataFrame = {
    val sampleCol = sampleCols.head
    val keys = keyCols.map(col)

    val aggExprs = count(lit(1)).as("n_mentions") +: minCols.map(c => min(col(c)).as(c))
    val counts = df.groupBy(keys: _*).agg(aggExprs.head, aggExprs.tail: _*)

    val distinctSamples = df.select((keyCols :+ sampleCol).map(col): _*).distinct()
      .withColumn("_salt", pmod(xxhash64(col(sampleCol)), lit(salts)))
    val w = Window.partitionBy((keyCols :+ "_salt").map(col): _*).orderBy(col(sampleCol))
    val bounded = distinctSamples
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= samplePerKey)
    val samples = bounded.groupBy(keys: _*)
      .agg(slice(sort_array(collect_list(col(sampleCol))), 1, samplePerKey)
        .as("sample_conv_ids"))

    counts.join(samples, keyCols, "left_outer")
  }

  /** Deterministically salted repartition: spreads a hot key's rows across
    * `salts` partitions without changing row content (for downstream
    * per-partition work after a skewed stage).
    */
  def spread(df: DataFrame, salts: Int, contentCols: Seq[String]): DataFrame =
    df.repartition(col(contentCols.head), pmod(xxhash64(contentCols.map(col): _*), lit(salts)))
}
