package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.VectorExpressions

/** Session-extension entry point: install the graft native functions
  * into any SparkSession via configuration —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the standard
  * deployment hook for cluster-wide availability (no code changes in
  * user jobs). The SQL-UDF helpers (graft_clean_name,
  * graft_haversine_km) still register per-session via
  * [[GraftFunctions.register]] since SQL UDFs are session-scoped.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProductExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => VectorExpressions.DotProductExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[VectorExpressions.L2NormExpr].getName, "graft_l2norm"),
      (exprs: Seq[Expression]) => VectorExpressions.L2NormExpr(exprs.head)))
  }
}
