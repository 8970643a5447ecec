package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Session-extension wiring (SURVEY §4: the one custom-Catalyst piece the
  * engine ships): registers the codegen'd vector functions into Spark SQL,
  * so `spark.sql("SELECT dot_product(a, b) ...")` works alongside the
  * DataFrame API.
  *
  * Use at session build time:
  *   `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or on a live session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
  }
}

object GraftExtensions {
  private val dotProductBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "dot_product takes exactly 2 arguments")
    DotProduct(exprs.head, exprs(1))
  }

  private val dotProductDescriptor =
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      dotProductBuilder)

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotProductDescriptor._1, dotProductDescriptor._2, dotProductDescriptor._3)
}
