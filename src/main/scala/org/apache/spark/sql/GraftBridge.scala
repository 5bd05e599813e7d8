package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> catalyst Expression bridge. Spark 4 hides ExpressionUtils behind
 * `private[sql]`, so libraries shipping custom native Expressions (see
 * graft.plans) need this one-file shim in the sql package — the same pattern
 * Sedona/Frameless-style extensions use. No Spark internals are modified.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** AtomicType / IntegralType are `protected[sql]` in Spark 4 — expose the
    * two type predicates libraries need (salt-hashable columns, loud id-type
    * checks) without enumerating concrete types at every call site. */
  def isAtomic(dt: types.DataType): Boolean = dt.isInstanceOf[types.AtomicType]
  def isIntegral(dt: types.DataType): Boolean = dt.isInstanceOf[types.IntegralType]

  /** A fresh session on an existing context with `configure` applied as its
    * SparkSessionExtensions — the ONLY way to test the production
    * `spark.sql.extensions=graft.plans.GraftExtensions` code path
    * (injectOptimizerRule placement in the fixed-point operator-optimization
    * batch) inside a JVM that already holds a default session, since
    * Builder.getOrCreate ignores extension configs when a session exists. */
  def sessionWithExtensions(sc: org.apache.spark.SparkContext,
                            configure: SparkSessionExtensions => Unit): classic.SparkSession = {
    val ext = new SparkSessionExtensions
    configure(ext)
    // the 6-arg constructor is Scala-private but bytecode-public (private[x]
    // erasure) — reflection is the stable way in for a test-only helper
    val ctor = classOf[classic.SparkSession].getConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(sys.error("classic.SparkSession 6-arg constructor not found"))
    ctor.newInstance(sc, None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[classic.SparkSession]
  }
}
