package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: widen row-value cursor predicates with their pushable
  * scalar bounds.
  *
  * The engine's resumable scans filter on
  * `struct(lsn, id) > struct(LIT_lsn, LIT_id)` (S4 keyset cursor, G2).
  * The struct comparison is exact but opaque to parquet — data sources
  * cannot push struct ordering, so without help a resume scans every file.
  * This rule conjoins the implied scalar bounds, both pushable:
  *  - `lsn >= LIT_lsn` — a plain range that prunes all non-tail files;
  *  - `lsn > LIT_lsn OR (lsn = LIT_lsn AND id > LIT_id)` — the exact
  *    two-component expansion; parquet pushes OR-of-range predicates, so
  *    row groups inside the cursor's own lsn whose id range is already
  *    consumed are pruned too (the drain-a-big-append-in-batches case).
  *
  * Soundness: `(a,b) > (x,y)` is exactly `a > x OR (a = x AND b > y)` for
  * a two-field struct with NON-NULL literals x and y (bounds are emitted
  * only then — Spark's struct ordering is a nulls-first TOTAL order, so a
  * null literal component would make the struct comparison true/false
  * where the scalar rewrite is null and wrongly drop rows). A null column
  * value makes both forms null identically. The `a >= x` widening holds
  * whenever the comparison is true and is null whenever `a` is null.
  * Idempotent: bounds are only added when not already present among the
  * conjuncts (EventLog.scan also writes them by hand; plans stay stable
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

  /** struct(a, b, ...) > <struct literal> → pushable scalar bounds when the
    * struct fields are plain attributes. Constant folding has usually
    * collapsed the right-hand struct into a single struct Literal by the
    * time user rules run; the pre-fold CreateNamedStruct shape is handled
    * too. Emits `a >= la` always, plus the exact 2-component disjunction
    * when the struct has exactly two fields. */
  private def impliedBound(e: Expression): Seq[Expression] = e match {
    case GreaterThan(CreateNamedStruct(lhs), rhs) if lhs.size >= 2 =>
      // CreateNamedStruct children alternate (name, value): values at 1, 3, …
      val fields = lhs.grouped(2).map(_.last).toSeq
      val lits: Seq[Literal] = rhs match {
        case Literal(row: org.apache.spark.sql.catalyst.InternalRow,
            st: org.apache.spark.sql.types.StructType) if st.size == fields.size =>
          st.zipWithIndex.map { case (f, i) => Literal(row.get(i, f.dataType), f.dataType) }
        case CreateNamedStruct(rvs) if rvs.size == lhs.size =>
          val vs = rvs.grouped(2).map(_.last).toSeq
          if (vs.forall(_.isInstanceOf[Literal])) vs.map(_.asInstanceOf[Literal])
          else Seq.empty
        case _ => Seq.empty
      }
      // NULL literal components are excluded: Spark's struct ORDERING is a
      // nulls-first total order (struct(5,7) > struct(5,null) is TRUE),
      // while the scalar rewrite `b > null` is NULL — conjoining it would
      // wrongly drop rows. Engine cursors are never null, but the rule is
      // session-wide and must be sound for arbitrary user structs.
      (fields.headOption, lits.headOption) match {
        case (Some(a: Attribute), Some(la)) if la.value != null =>
          val coarse = GreaterThanOrEqual(a, la)
          (fields, lits) match {
            case (Seq(_, b: Attribute), Seq(_, lb)) if fields.size == 2 && lb.value != null =>
              Seq(coarse,
                Or(GreaterThan(a, la), And(EqualTo(a, la), GreaterThan(b, lb))))
            case _ => Seq(coarse)
          }
        case _ => Seq.empty
      }
    case _ => Seq.empty
  }
}
