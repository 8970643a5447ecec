package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

import org.apache.spark.sql.graft.Bridge

/** Static kernel for the curriculum pivot-bucket assignment — the
  * [[AnnKernels]] pattern: one tight static-call loop per row instead of
  * an interpreted higher-order `aggregate` over pivot literals.
  *
  * [[graft.operators.Sampling.curriculumShards]] buckets every row by
  * "# pivots lexicographically ≤ (score, id)". With the pivots SORTED by
  * (score, id) that count is a plain upper_bound — O(log m) per row
  * instead of the HOF's O(m) — and the comparison uses PRIMITIVE double
  * `<`/`==` (NaN is guarded upstream; -0.0 == 0.0), exactly the codegen
  * semantics of the Catalyst `<`/`===` chain it replaces, so bucket
  * assignments are bit-identical to the HOF form. */
object PivotKernels {
  /** upper_bound: # of sorted pivots (ps(i), pid(i)) ≤ (s, id). */
  def pivotBucket(s: Double, id: Long,
                  ps: Array[Double], pid: Array[Long]): Int = {
    var lo = 0
    var hi = ps.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ps(mid) < s || (ps(mid) == s && pid(mid) <= id)) lo = mid + 1
      else hi = mid
    }
    lo
  }
}

/** Bucket index of (score, id) among the sorted pivot boundary pairs —
  * codegen'd (one static call; the arrays ride along as reference
  * objects, never serialized into the generated source, so any pivot
  * count stays under the janino 64 KB method budget). */
final case class PivotBucket(left: Expression, right: Expression,
                             pScores: Array[Double], pIds: Array[Long])
    extends BinaryExpression {
  require(pScores.length == pIds.length,
    "pivot score/id arrays must be the same length")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pivot_bucket"

  override protected def nullSafeEval(s: Any, id: Any): Any =
    PivotKernels.pivotBucket(s.asInstanceOf[Double], id.asInstanceOf[Long],
      pScores, pIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, id) => {
      val sc = ctx.addReferenceObj("pivotScores", pScores, "double[]")
      val ids = ctx.addReferenceObj("pivotIds", pIds, "long[]")
      s"${ev.value} = graft.functions.PivotKernels.pivotBucket($s, $id, $sc, $ids);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PivotBucket =
    copy(left = newLeft, right = newRight)
}

object PivotExpressions {
  /** # of sorted pivots ≤ (score, id) — int bucket index in [0, m]. */
  def pivotBucket(score: Column, id: Column,
                  pScores: Array[Double], pIds: Array[Long]): Column =
    Bridge.column(PivotBucket(Bridge.expression(score), Bridge.expression(id),
      pScores, pIds))
}
