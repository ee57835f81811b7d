package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.DotProduct

/** Engine extensions, installed via `spark.sql.extensions`: registers the
  * native vector expressions as SQL functions so both the Column API
  * (`call_function("graft_dot", ...)`) and plain SQL can reach them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_dot`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        DotProduct(children.head, children(1))
      }))
    // declarative HOF dot products upgrade to the native expression
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}
