package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.util.Hashing

/** FNV-1a 64-bit hash as a native Catalyst expression with codegen — the one
  * id function of the whole pipeline (entity ids, edge ids). A single hash
  * implementation shared bit-for-bit between driver-side Scala
  * ([[graft.util.Hashing.fnv64]]) and executor-side codegen keeps ids stable
  * across engines, plans and cluster sizes (no positional ids anywhere).
  * Codegen emits a direct static call, so the expression stays inside
  * whole-stage codegen (no UDF serialization, no interpreter fallback).
  */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Hashing.fnv64(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.util.Hashing.fnv64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Fnv64 = copy(child = newChild)
  override def prettyName: String = "graft_fnv64"
}

/** Polynomial rolling-hash document fingerprint (base 257, mod 2^61-1) over
  * the normalized character stream — order-sensitive, whitespace-collapsed.
  * Used by the text-analysis ops for exact-dup detection keyed on content
  * rather than raw bytes.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    RollingFingerprint.fingerprint(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingFingerprint.fingerprint($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
  override def prettyName: String = "graft_fingerprint"
}

object RollingFingerprint {
  private final val Mod = (1L << 61) - 1
  private final val Base = 257L
  /** Static entry point shared by interpreted eval and generated code. */
  def fingerprint(s: String): Long = {
    val t = s.toLowerCase.replaceAll("""\s+""", " ").trim
    var h = 0L
    var i = 0
    while (i < t.length) {
      // (h * Base + c) mod 2^61-1 without overflow: split the 128-bit product
      val hi = Math.multiplyHigh(h, Base)
      val lo = h * Base
      // fold 128-bit (hi:lo) mod 2^61-1:  x mod m where m = 2^61-1
      var x = (lo & Mod) + ((lo >>> 61) | (hi << 3)) + t.charAt(i).toLong
      while (x >= Mod) x -= Mod
      h = x
      i += 1
    }
    h
  }
}

/** Session-level registration; exposes the expressions as [[Column]]
  * functions via the public `call_function` resolver.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_fnv64", es => Fnv64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint", es => RollingFingerprint(es.head), "built-in")
  }
  def fnv64(c: Column): Column = call_function("graft_fnv64", c)
  def fingerprint(c: Column): Column = call_function("graft_fingerprint", c)
}
