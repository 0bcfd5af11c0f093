package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
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

/** splitmix64 finalizer ([[graft.util.Hashing.avalanche]]) as a native
  * codegen expression — full-avalanche mixing of a LongType column. Used
  * where a value-derived draw must be statistically independent across
  * adjacent keys AND reproducible outside the JVM (the IVF seeding hash:
  * plain column arithmetic would trip ANSI overflow checks, xxhash64 has no
  * DuckDB counterpart; this is three shift-xor-multiply steps the oracle
  * reruns in HUGEINT mod-2^64).
  */
case class Avalanche64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BIGINT, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Hashing.avalanche(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.util.Hashing.avalanche($c)")
  override protected def withNewChildInternal(newChild: Expression): Avalanche64 =
    copy(child = newChild)
  override def prettyName: String = "graft_avalanche64"
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

/** Random-hyperplane LSH signature as a native codegen expression:
  * bit r of the result = sign of ⟨vec, plane_r⟩, planes deterministic from
  * (numPlanes, dim, seed) via the avalanche-finalized hash stream and cached
  * per JVM in the companion. One tree node instead of numPlanes × dim
  * literal-array expressions — without this, plans carrying banded-LSH
  * signatures ballooned to thousands of literals per column, which is what
  * made Spark's per-execution plan-string rendering a driver bottleneck.
  */
case class HyperplaneSig(child: Expression, numPlanes: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.signature(v.asInstanceOf[ArrayData], numPlanes, dim, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneSig.signature($c, $numPlanes, $dim, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_sig"
}

object HyperplaneSig {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]

  /** Deterministic pseudo-random planes, component uniform in [-1, 1) from
    * the avalanche-finalized hash (see Hashing.unitMixed for why plain FNV
    * bits must not be used). Cached per (numPlanes, dim, seed) per JVM.
    */
  def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    cache.computeIfAbsent((numPlanes, dim, seed), key =>
      Array.tabulate(key._1, key._2)((r, i) =>
        Hashing.unitMixed(key._3, "plane", r, i) * 2.0 - 1.0))

  /** Static entry point shared by interpreted eval and generated code. */
  def signature(vec: ArrayData, numPlanes: Int, dim: Int, seed: Long): Long = {
    val ps = planes(numPlanes, dim, seed)
    val n = math.min(vec.numElements(), dim)
    var sig = 0L
    var r = 0
    while (r < numPlanes) {
      val p = ps(r)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += vec.getDouble(i) * p(i); i += 1 }
      if (dot >= 0) sig |= (1L << r)
      r += 1
    }
    sig
  }
}

/** 64-bit SimHash over whitespace tokens as ONE native codegen expression:
  * bit j of the result is the sign of Σ over tokens of (xxhash64(token) has
  * bit j ? +1 : -1). Bit-identical to the declarative formula
  * `(0 until 64).map(j => aggregate(transform(split(text," "), xxhash64), …))`
  * — which embeds the token-hash subtree into all 64 bit lambdas (split +
  * hash evaluated 64× per row) and walks the token array 64 times. Here:
  * one pass, one token buffer, zero array allocations per bit.
  * Token hashing reuses Spark's own XXH64 (seed 42, the xxhash64 default)
  * so signatures stay comparable with any column-level xxhash64 derivation.
  */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Simhash64.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

object Simhash64 {
  /** Static entry point shared by interpreted eval and generated code.
    * Tokenization matches Spark's `split(text, " ")` (regex single space,
    * limit -1: interior AND trailing empty tokens kept — Java's 1-arg
    * split drops trailing empties, so the limit matters for parity).
    *
    * Per-token hash is the repo-standard FNV-1a 64 ([[graft.util.Hashing]]) —
    * the same id function the rest of the pipeline uses, and byte-exactly
    * reproducible in plain SQL (the DuckDB oracle folds it with
    * `list_reduce`), which turns the simhash candidate lists into
    * hash-checked oracle rows instead of rows-only entries.
    */
  def compute(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = graft.util.Hashing.fnv64(toks(t))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Token n-gram shingle set as ONE native codegen expression — bit-identical
  * to the declarative `array_distinct(transform(sequence(1, size(toks)-n+1),
  * i => concat_ws(" ", toks[i..i+n-1])))` over `split(text, " ")` (regex
  * split, limit -1: interior and trailing empty tokens kept), including
  * first-occurrence order of the distinct set. The declarative form is a
  * higher-order-function chain that evaluates its lambdas interpreted, per
  * element, outside whole-stage codegen; this is one pass with one string
  * buffer.
  */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TokenShingles.compute(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenShingles.compute($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
  override def prettyName: String = "graft_token_shingles"
}

object TokenShingles {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature over a shingle array as ONE native codegen expression —
  * bit-identical to `transform(sequence(0, numHashes-1), k =>
  * array_min(transform(sh, s => xxhash64(s, k))))` (each element hashed by
  * Spark's own XXH64: string with seed 42, then the int k folded in).
  * The declarative form re-hashes every shingle string numHashes times and
  * allocates numHashes intermediate arrays per row in interpreted
  * higher-order lambdas; here each shingle's string hash is computed ONCE
  * and the k-th variant is a single XXH64 int-mix — numHashes× less string
  * hashing, zero intermediate arrays. An empty shingle array yields an
  * all-null signature (= array_min over empty), which callers filter the
  * same way they filter the declarative form's.
  */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(v: Any): Any =
    MinhashSig.signature(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSig.signature($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

object MinhashSig {
  /** Static entry point shared by interpreted eval and generated code. */
  def signature(sh: ArrayData, numHashes: Int): ArrayData = {
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](numHashes)) // nulls
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      // xxhash64(s, k) = XXH64(string, seed 42) folded with hashInt(k, ·);
      // a null element leaves the seed untouched (Spark hash semantics)
      val h1 =
        if (sh.isNullAt(i)) 42L
        else {
          val u = sh.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        }
      var k = 0
      while (k < numHashes) {
        val hk = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, h1)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) { out(k) = mins(k); k += 1 }
    new GenericArrayData(out)
  }
}

/** Cosine similarity of two `array<double>` vectors as ONE native codegen
  * expression — bit-identical to the declarative
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with
  * `dot = aggregate(zip_with(a,b,_*_), 0.0, _+_)` (same left-to-right
  * summation order; mismatched lengths or a null element poison the result
  * to null exactly like zip_with's null padding does). The declarative form
  * is three interpreted higher-order traversals plus two zip_with array
  * allocations per evaluation — per candidate PAIR in the near-dup
  * verifiers; this is one fused pass, zero allocations. ONE deliberate
  * divergence: a zero-norm vector yields NaN (dropped by any `>= threshold`
  * filter), where the ANSI declarative division throws DIVIDE_BY_ZERO —
  * a corpus-scale job must not die on one degenerate row.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute() returns a boxed java.lang.Double (null on poisoned input),
    // so the generated code must unbox + propagate the null flag
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double graftCos = graft.functions.CosineSim.compute($a, $b);
         |if (graftCos == null) { ${ev.isNull} = true; } else { ${ev.value} = graftCos.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine"
}

object CosineSim {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // zip_with pads the shorter side with null and null poisons the sums
    if (na != nb) return null
    var dot = 0.0
    var n2a = 0.0
    var n2b = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      n2a += x * x
      n2b += y * y
      i += 1
    }
    dot / (math.sqrt(n2a) * math.sqrt(n2b))
  }
}

/** Session-level registration; exposes the expressions as [[Column]]
  * functions via the public `call_function` resolver. The Column helpers
  * self-register against the active session, so call sites never depend on
  * some earlier query having called [[register]] first.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_fnv64", es => Fnv64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint", es => RollingFingerprint(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash", es => Simhash64(es.head), "built-in")
    def litInt(es: Seq[Expression], i: Int, fn: String): Int = {
      val e = es(i)
      if (!e.foldable) throw new IllegalArgumentException(
        s"$fn: argument $i must be a literal, got non-foldable ${e.sql}")
      e.eval().asInstanceOf[Number].intValue()
    }
    reg.createOrReplaceTempFunction("graft_token_shingles",
      es => TokenShingles(es.head, litInt(es, 1, "graft_token_shingles")), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      es => MinhashSig(es.head, litInt(es, 1, "graft_minhash_sig")), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSim(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_avalanche64",
      es => Avalanche64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_bounded_min_set", es => {
      val e = es(1)
      if (!e.foldable) throw new IllegalArgumentException(
        s"graft_bounded_min_set: k must be a literal, got non-foldable ${e.sql}")
      BoundedMinSet(es.head, e.eval().asInstanceOf[Number].intValue())
    }, "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_sig", es => {
      // SQL callers pass integer literals (IntegerType); Column callers pass
      // lit(Long) — accept any foldable numeric and coerce, instead of a
      // ClassCastException from a blind asInstanceOf
      def num(i: Int, what: String): Number = {
        val e = es(i)
        if (!e.foldable) throw new IllegalArgumentException(
          s"graft_hyperplane_sig: argument $what must be a literal, got non-foldable ${e.sql}")
        e.eval() match {
          case n: Number => n
          case other => throw new IllegalArgumentException(
            s"graft_hyperplane_sig: argument $what must be numeric, got $other")
        }
      }
      HyperplaneSig(es.head, num(1, "numPlanes").intValue(),
        num(2, "dim").intValue(), num(3, "seed").longValue())
    }, "built-in")
  }
  private def ensure(): Unit = SparkSession.getActiveSession.foreach(register)
  def fnv64(c: Column): Column = { ensure(); call_function("graft_fnv64", c) }
  /** splitmix64 finalizer of a BIGINT column ([[Avalanche64]]). */
  def avalanche64(c: Column): Column = { ensure(); call_function("graft_avalanche64", c) }
  def fingerprint(c: Column): Column = { ensure(); call_function("graft_fingerprint", c) }
  def simhash64(c: Column): Column = { ensure(); call_function("graft_simhash", c) }
  /** Distinct token n-gram shingles, first-occurrence order ([[TokenShingles]]). */
  def tokenShingles(c: Column, n: Int): Column =
    { ensure(); call_function("graft_token_shingles", c, lit(n)) }
  /** MinHash signature of a shingle array ([[MinhashSig]]). */
  def minhashSig(c: Column, numHashes: Int): Column =
    { ensure(); call_function("graft_minhash_sig", c, lit(numHashes)) }
  /** Cosine similarity of two array<double> vectors ([[CosineSim]]). */
  def cosine(a: Column, b: Column): Column =
    { ensure(); call_function("graft_cosine", a, b) }
  /** k smallest distinct values of `c`, sorted ascending ([[BoundedMinSet]]). */
  def boundedMinSet(c: Column, k: Int): Column =
    { ensure(); call_function("graft_bounded_min_set", c, lit(k)) }
  def hyperplaneSig(c: Column, numPlanes: Int, dim: Int, seed: Long): Column = {
    ensure()
    call_function("graft_hyperplane_sig", c, lit(numPlanes), lit(dim), lit(seed))
  }
}
