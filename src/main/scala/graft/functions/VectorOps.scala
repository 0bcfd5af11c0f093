package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared vector arithmetic over `array<double>` columns — the single
  * definition used by dedup near-dup, ANN search and any future scorer
  * (native `zip_with`/`aggregate`, fully codegen'd; no UDFs).
  */
object VectorOps {
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  def norm(a: Column): Column = sqrt(dot(a, a))
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
