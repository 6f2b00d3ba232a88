package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: widen row-value cursor predicates with their pushable
  * first-component bound.
  *
  * The engine's resumable scans filter on
  * `struct(lsn, id) > struct(LIT_lsn, LIT_id)` (S4 keyset cursor, G2).
  * The struct comparison is exact but opaque to parquet — data sources
  * cannot push struct ordering, so without help a resume scans every file.
  * This rule conjoins the implied scalar bound `lsn >= LIT_lsn`, which IS
  * pushable and prunes all non-tail files via min/max stats.
  *
  * Soundness: `(a,b) > (x,y)` implies `a >= x` whenever the comparison
  * yields true; when `a` is null both the struct comparison and the added
  * bound evaluate to null, so the conjunction filters identically.
  * Idempotent: the bound is only added when not already present among the
  * conjuncts (EventLog.scan also writes it by hand; plans stay stable
  * under re-optimization).
  *
  * This is the one plan rewrite the engine justifies (SURVEY §4: "no
  * custom Rule needed for parity" — this is a performance rule, injected
  * via GraftExtensions.injectOptimizerRule).
  */
object RowValueCursorBound extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val bounds = conjuncts.flatMap(impliedBound).filter(b =>
        !conjuncts.exists(_.semanticEquals(b)))
      if (bounds.isEmpty) f
      else Filter(bounds.foldLeft(cond)(And(_, _)), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** struct(a, ...) > <struct literal> → Some(a >= lit) when `a` is a
    * plain attribute. Constant folding has usually collapsed the
    * right-hand struct into a single struct Literal by the time user
    * rules run; the pre-fold CreateNamedStruct shape is handled too. */
  private def impliedBound(e: Expression): Option[Expression] = e match {
    case GreaterThan(CreateNamedStruct(lhs), rhs) if lhs.size >= 2 =>
      val first = lhs(1)
      (first, rhs) match {
        case (a: Attribute, Literal(row: org.apache.spark.sql.catalyst.InternalRow,
            st: org.apache.spark.sql.types.StructType)) if st.nonEmpty =>
          val ft = st.head.dataType
          Some(GreaterThanOrEqual(a, Literal(row.get(0, ft), ft)))
        case (a: Attribute, CreateNamedStruct(rvs)) if rvs.size >= 2 =>
          rvs(1) match {
            case l: Literal => Some(GreaterThanOrEqual(a, l))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }
}
