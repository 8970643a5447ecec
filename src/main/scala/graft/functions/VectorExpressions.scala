package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The built-in higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback — every element evaluation goes through interpreted
  * lambda plumbing, which dominates pairwise-similarity workloads (n² pairs
  * × d elements). [[DotProduct]] generates a tight primitive loop inside
  * whole-stage codegen instead: no lambdas, no boxing, no per-element
  * virtual calls. This is the "custom Expression beats UDF beats
  * interpreted" escalation path (SURVEY §7.3) — the one place the engine
  * needs custom Catalyst work for performance rather than semantics.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null-element propagation can produce null even from non-null inputs
  // (also guarantees ev.isNull is a mutable slot in generated code)
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  // A null ELEMENT yields a null result — the same propagation as the HOF
  // formulation (`aggregate(zip_with(a,b,(x,y)=>x*y),0.0,_+_)`: one null
  // product poisons the sum). getDouble on a null slot would silently read
  // garbage; the guard costs one bitmap test per element.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize an array<double> column in one codegen'd pass.
  *
  * The higher-order-function formulation (three `transform`/`aggregate`
  * passes) is CodegenFallback: every element goes through interpreted
  * lambda plumbing, and the enclosing expression tree is re-evaluated per
  * element — measured as the dominant cost of the similarity operators
  * once the dot product itself was native. Semantics are bit-identical to
  * `transform(dv, x => x / sqrt(aggregate(transform(dv, x => x*x), 0.0,
  * _+_)))`: left-to-right accumulation, IEEE division (a zero vector
  * yields NaNs, exactly like the HOF form and the DuckDB oracle). */
final case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  // null-element propagation can produce null even from non-null inputs
  // (also guarantees ev.isNull is a mutable slot in generated code)
  override def nullable: Boolean = true

  override def prettyName: String = "l2_normalize"

  // A null ELEMENT yields a null result array (declared containsNull=false,
  // so element-level null propagation is not representable; whole-null is
  // the honest degradation and keeps getDouble off null slots).
  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getDouble(i); s += v * v; i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) {
         |  double $norm = java.lang.Math.sqrt($s);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $a.getDouble($i) / $norm;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** Winnowing document fingerprints in one native per-row pass (a
  * rolling-window selection over k-gram hashes): normalize, hash every
  * char k-gram, keep each w-window's minimum, dedup. The higher-order
  * function formulation recomputes the normalized string and the gram
  * array inside every lambda element (O(n²) interpreted work per row);
  * this expression is a single O(n·k) loop. md5-derived hashes keep the
  * DuckDB oracle exact (same selection as a Rabin-Karp rolling hash —
  * winnowing only cares about the per-gram hash values). */
final case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, s"winnow k-gram size must be >= 1, got $k")
  require(w >= 1, s"winnow window size must be >= 1, got $w")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)

  override def prettyName: String = "winnow_fingerprints"

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  private def hash60(s: String): Long = {
    val d = md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex digits == high 60 bits, matching
    // CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // normalization identical to lower(trim(text)) + regexp_replace(\s+," "):
    // Spark's trim strips only ' ' — replicate exactly (String.trim would
    // also strip control chars)
    var a = 0; var b = raw.length
    while (a < b && raw.charAt(a) == ' ') a += 1
    while (b > a && raw.charAt(b - 1) == ' ') b -= 1
    val s = raw.substring(a, b).toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
    val nGrams = math.max(s.length - (k - 1), 1)
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = hash60(s.substring(i, math.min(i + k, s.length)))
      i += 1
    }
    val nWins = math.max(nGrams - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWins) {
      var m = grams(j)
      var x = j + 1
      val end = math.min(j + w, nGrams)
      while (x < end) { if (grams(x) < m) m = grams(x); x += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object VectorExpressions {
  /** Codegen'd dot product of two array<double> columns. */
  def dotp(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Native winnowing fingerprints (see [[WinnowFingerprints]]). */
  def winnow(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))

  /** Codegen'd L2 normalization of an array<double> column. */
  def l2normalize(a: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(a)))
}
