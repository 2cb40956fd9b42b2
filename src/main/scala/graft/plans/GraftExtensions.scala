package graft.plans

import graft.expressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native expressions so they are
  * callable from SQL and `call_function` on any session configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession sets
  * this). This is the public, supported extension point — no
  * `private[sql]` internals are touched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
  }
}
