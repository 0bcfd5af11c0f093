package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared vector arithmetic over `array<double>` columns — the single
  * definition used by dedup near-dup, ANN search and any future scorer.
  * Cosine is the native one-pass [[graft.functions.CosineSim]] expression:
  * Spark's higher-order functions (zip_with/aggregate) evaluate their
  * lambdas interpreted per element, so the declarative cosine cost three
  * array traversals plus two intermediate arrays per candidate PAIR in the
  * near-dup verifiers. Bit-identical (OpsSpec parity gate).
  */
object VectorOps {
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  def norm(a: Column): Column = sqrt(dot(a, a))
  def cosine(a: Column, b: Column): Column = graft.functions.GraftFunctions.cosine(a, b)
  /** The declarative formula [[cosine]] must match (parity spec). */
  private[graft] def cosineDeclarative(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
