package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DoubleType, LongType}

/**
 * Catalyst rule (SURVEY.md §4 phase 2): a join whose condition contains
 * `st_dwithin(geom_a, geom_b, d)` — the naive spatial join a user would
 * write, which Spark can only plan as a cartesian/BNL join — is rewritten
 * into the cell-bucketed equi-join SpatialJoin builds by hand:
 *
 *   Generate(explode(CellCover(a, 0, s)))   ⋈ cell    <- hash-partitionable
 *   Generate(explode(CellCover(b, d, s)))
 *   Filter(STDWithin(a, b, d) AND cell = RefCell(a, b, d, s) AND rest)
 *
 * The RefCell reference-point equality makes the rewrite duplicate-free
 * (each true pair survives from exactly one shared cell), so multiplicity
 * matches the original join exactly — no distinct needed. Runs in the
 * optimizer, so it composes with column pruning / AQE / broadcast selection.
 *
 * Registered via `spark.sql.extensions=graft.plans.GraftExtensions`
 * (spark-submit) or GraftExtensions.install(spark) (existing session).
 */
object DWithinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotency guard (ADVICE r2, high): registered via injectOptimizerRule
    * the rule lands in the operator-optimization FIXED-POINT batch, where
    * PushPredicateThroughJoin pushes the STDWithin refinement back into the
    * rewritten join's condition on the next iteration — without a guard the
    * rule re-fires on its own output and nests a Generate layer per iteration
    * (observed OOM). Two independent guards: a TreeNodeTag on the rewritten
    * Join, plus a structural check for our own artifacts (RefCell/CellCover/
    * `__cell_*` attributes) in the condition — the tag alone is not enough
    * because optimizer rules may rebuild Join nodes without copying tags. */
  private[plans] val RewrittenTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.dwithin.rewritten")

  private def isOwnRewrite(cond: Expression): Boolean = cond.exists {
    case _: RefCell   => true
    case _: CellCover => true
    case a: AttributeReference if a.name == "__cell_l" || a.name == "__cell_r" => true
    case _ => false
  }

  /** cell size: never below the radius (1-ring cover), never below 1 km
    * (cells far smaller than the data extent explode the cover arrays). */
  private def cellSizeFor(d: Double): Double = math.max(d, 1000.0)

  private def asDouble(e: Expression): Option[Double] =
    if (!e.foldable) None
    else e.eval() match {
      case d: java.lang.Double  => Some(d)
      case f: java.lang.Float   => Some(f.toDouble)
      case dec: Decimal         => Some(dec.toDouble)
      case i: java.lang.Integer => Some(i.toDouble)
      case l: java.lang.Long    => Some(l.toDouble)
      case _                    => None
    }

  /** match st_dwithin(ga, gb, d) — the registered UDF or the native expr —
    * with ga from one side and gb from the other; normalize to (left-geom,
    * right-geom, d). */
  private def extractDWithin(e: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Double)] = {
    val args: Option[(Expression, Expression, Expression)] = e match {
      case u: ScalaUDF if u.udfName.exists(_.equalsIgnoreCase("st_dwithin")) &&
          u.children.size == 3 =>
        Some((u.children(0), u.children(1), u.children(2)))
      case STDWithin(a, b, d) => Some((a, b, d))
      case _ => None
    }
    args.flatMap { case (a, b, dExpr) =>
      asDouble(dExpr).filter(_ > 0).flatMap { d =>
        val (ra, rb) = (a.references, b.references)
        if (ra.nonEmpty && rb.nonEmpty &&
            ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet))
          Some((a, b, d))
        else if (ra.nonEmpty && rb.nonEmpty &&
            rb.subsetOf(left.outputSet) && ra.subsetOf(right.outputSet))
          Some((b, a, d))
        else None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if j.getTagValue(RewrittenTag).isEmpty && !isOwnRewrite(cond) =>
      val preds = splitConjunctivePredicates(cond)
      preds.iterator.flatMap(p => extractDWithin(p, left, right).map(p -> _))
        .nextOption() match {
        case None => j
        case Some((p, (ga, gb, d))) =>
          val s = cellSizeFor(d)
          val cellL = AttributeReference("__cell_l", LongType, nullable = false)()
          val cellR = AttributeReference("__cell_r", LongType, nullable = false)()
          val genL = Generate(Explode(CellCover(ga, Literal(0.0), Literal(s))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(cellL), child = left)
          val genR = Generate(Explode(CellCover(gb, Literal(d), Literal(s))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(cellR), child = right)
          val bucketJoin = Join(genL, genR, Inner,
            Some(EqualTo(cellL, cellR)), hint)
          bucketJoin.setTagValue(RewrittenTag, true)
          // exact refinement (native, codegen) + reference-cell dedup + any
          // remaining original predicates
          val refine = STDWithin(ga, gb, Literal(d))
          val refEq = EqualTo(cellL, RefCell(ga, gb, Literal(d), Literal(s)))
          val rest = preds.filterNot(_ eq p)
          val filter = Filter((Seq(refine, refEq) ++ rest).reduce(And), bucketJoin)
          Project(left.output ++ right.output, filter)
      }
  }
}

/** spark.sql.extensions entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => DWithinJoinRule)
}

object GraftExtensions {
  /** attach the rule to an already-running session (tests, spark-shell). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(DWithinJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DWithinJoinRule
}
