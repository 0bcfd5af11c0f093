package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.graph.GraphTables

/** Tab-separated edge-list reader (the reference's only file connector:
  * a driver-side scala-csv loop over the SNAP web-Google dump,
  * apps/Benchmark.scala:64-91, nodes derived by distinct over endpoints
  * :83-86, rel ids assigned by zipWithIndex :88-90).
  *
  * Spark-native re-expression: a distributed CSV scan; node derivation is a
  * distinct over the unioned endpoint columns; edge ids are content-derived
  * hashes instead of positional zipWithIndex (positional ids break under
  * repartitioning/resume — SURVEY.md §7.6(2)).
  */
object EdgeListSource {

  /** Read a `src<TAB>dst` edge list (lines starting with '#' are comments,
    * matching the SNAP format) into a property graph with `label`-labeled
    * nodes and `relType`-typed edges.
    */
  def read(spark: SparkSession, path: String, label: String = "Page",
      relType: String = "LINKS", sep: String = "\t"): GraphTables = {
    GraftFunctions.register(spark)
    val raw = spark.read
      .option("sep", sep)
      .option("comment", "#")
      .schema("src LONG, dst LONG")
      .csv(path)
      .where(col("src").isNotNull && col("dst").isNotNull)

    val edges = raw.select(
      GraftFunctions.fnv64(concat_ws(":", lit(relType), col("src"), col("dst"))).as("id"),
      col("src"), col("dst"), lit(relType).as("rel_type"))

    val nodes = raw.select(col("src").as("id"))
      .unionByName(raw.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").cast("string").as("name"),
        array(lit(label)).as("labels"))

    GraphTables(nodes, edges)
  }
}
