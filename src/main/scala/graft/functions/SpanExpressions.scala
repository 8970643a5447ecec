package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compact codegen'd kernels for substring-level dedup
  * ([[graft.operators.Dedup.duplicateSpans]] — the Lee et al. 2022
  * "Deduplicating Training Data Makes Language Models Better"
  * ExactSubstr family re-expressed over a distributed k-gram inverted
  * index instead of a monolithic suffix array).
  *
  * Same doctrine as [[AnnKernels]]: each kernel is one static JVM method
  * over per-row bounded arrays, the generated code is a single static
  * call, and method size is O(1) in every parameter — whole-stage codegen
  * always survives.
  */
object SpanKernels {

  /** Merge sorted duplicated k-gram start positions (1-based) into maximal
    * runs of covered token positions: gram at start s covers [s, s+k-1];
    * runs merge while the next gram starts at or before (current end + 1).
    * Output: int pairs flattened as (s1, e1, s2, e2, …) — the caller
    * reshapes to structs. Input MUST be sorted ascending (the operator
    * sorts via sort_array). */
  def mergeSpans(starts: ArrayData, k: Int): Array[Int] = {
    val n = starts.numElements()
    if (n == 0) return Array.emptyIntArray
    val out = new Array[Int](2 * n)
    var m = 0
    var curS = starts.getInt(0)
    var curE = curS + k - 1
    var i = 1
    while (i < n) {
      val s = starts.getInt(i)
      if (s <= curE + 1) { val e = s + k - 1; if (e > curE) curE = e }
      else { out(m) = curS; out(m + 1) = curE; m += 2; curS = s; curE = s + k - 1 }
      i += 1
    }
    out(m) = curS; out(m + 1) = curE; m += 2
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** Rebuild the document text keeping only tokens OUTSIDE the (sorted,
    * disjoint) duplicated spans, joined by single spaces. `spans` is the
    * flattened (s1, e1, s2, e2, …) pair list over 1-based inclusive token
    * positions. */
  def removeSpans(toks: ArrayData, spans: ArrayData): UTF8String = {
    val n = toks.numElements()
    val m = spans.numElements()
    val sb = new java.lang.StringBuilder
    var first = true
    var si = 0
    var p = 1
    while (p <= n) {
      while (si < m && spans.getInt(si + 1) < p) si += 2
      val covered = si < m && spans.getInt(si) <= p && p <= spans.getInt(si + 1)
      if (!covered) {
        if (!first) sb.append(' ')
        sb.append(toks.getUTF8String(p - 1).toString)
        first = false
      }
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Sorted duplicated-gram starts → merged maximal covered runs as the
  * FLAT int array (s1, e1, s2, e2, …) — see [[SpanKernels.mergeSpans]].
  * Flat so both consumers stay one static call: the span report reshapes
  * to structs with built-in `transform`/`sequence`, the removal transform
  * feeds it to [[RemoveSpans]] directly. */
final case class MergeSpans(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"span gram size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "merge_spans"

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(
      SpanKernels.mergeSpans(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.SpanKernels.mergeSpans($v, $k));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MergeSpans =
    copy(child = newChild)
}

/** (tokens, flattened span pairs) → cleaned text with covered tokens
  * removed (see [[SpanKernels.removeSpans]]). */
final case class RemoveSpans(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "remove_spans"

  override protected def nullSafeEval(toks: Any, spans: Any): Any =
    SpanKernels.removeSpans(toks.asInstanceOf[ArrayData],
      spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.SpanKernels.removeSpans($t, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveSpans =
    copy(left = newLeft, right = newRight)
}

object SpanExpressions {
  /** Merged duplicated spans from sorted gram starts. */
  def mergeSpans(starts: Column, k: Int): Column =
    Bridge.column(MergeSpans(Bridge.expression(starts), k))

  /** Cleaned text with spanned tokens removed. `spans` is the flattened
    * (s, e, s, e, …) int array. */
  def removeSpans(toks: Column, spans: Column): Column =
    Bridge.column(RemoveSpans(Bridge.expression(toks), Bridge.expression(spans)))
}
