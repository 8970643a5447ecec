package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions.{DotProduct, L2Normalize, WinnowFingerprints}

/** Session-extension wiring (SURVEY §4: the one custom-Catalyst piece the
  * engine ships): registers the codegen'd vector/text functions into Spark
  * SQL, so `spark.sql("SELECT dot_product(a, b) ...")` works alongside the
  * DataFrame API.
  *
  * Use at session build time:
  *   `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or on a live session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def litInt(e: Expression, arg: String): Int = {
    require(e.foldable, s"$arg must be a literal integer")
    e.eval() match {
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long)
        if n.asInstanceOf[Number].longValue().isValidInt =>
        n.asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(
        s"$arg must be a literal integer, got $other")
    }
  }

  // SQL arguments arrive untyped: the expressions read elements with
  // getDouble, so a non-double array (bigint/int/float from parquet) would
  // be reinterpreted as raw bits — cast first, like the DataFrame wrappers
  // do; an uncastable argument fails analysis loudly.
  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType, containsNull = true))

  private val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      { exprs =>
        require(exprs.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))
      }),
    (FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
      { exprs =>
        require(exprs.length == 1, "l2_normalize takes exactly 1 argument")
        L2Normalize(asDoubleArray(exprs.head))
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      { exprs =>
        require(exprs.length == 3,
          "winnow_fingerprints takes (text, k, w)")
        WinnowFingerprints(Cast(exprs.head, StringType),
          litInt(exprs(1), "k"), litInt(exprs(2), "w"))
      }))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
