package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The as-of join as a first-class Catalyst operator — tier (c) of the
  * custom-operator ladder (SURVEY §7.3): a logical node, a planner
  * strategy, and a physical operator that DECLARES its distribution and
  * ordering needs instead of hand-choreographing them.
  *
  * The mapPartitions spelling ([[graft.operators.AsOfJoin]]'s sweep)
  * hard-codes `repartition(n, key)` + `sortWithinPartitions` into the
  * DataFrame — opaque to the planner, so an upstream exchange that already
  * clusters by key is re-shuffled, and AQE cannot touch the hand-picked
  * partition count. Here [[AsOfJoinExec]] only REQUIRES
  * `ClusteredDistribution(key)` + `(key, time)` child ordering;
  * EnsureRequirements inserts exchanges/sorts exactly when the children
  * don't already satisfy them, and reuses them when they do.
  *
  * Node contract (fixed, by position): left = events `(key long,
  * ts timestamp, id long)`; right = queries `(key long, at_ts timestamp)`;
  * output = `(key, at_ts, last_id nullable)` — for each query row, the id
  * of the latest same-key event with `ts <= at_ts` (events AT the query
  * instant count), NULL when none precedes. Both sides consume exactly
  * once per partition in a two-pointer merge — the SortMergeJoin shape
  * with running-state semantics no built-in join composition reaches
  * without an O(|queries| × history) intermediate.
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    lastIdAttr: AttributeReference =
      AttributeReference("last_id", LongType, nullable = true)())
  extends BinaryNode {

  override def output: Seq[Attribute] = right.output :+ lastIdAttr

  // last_id is GENERATED here, not drawn from a child — declaring it keeps
  // CheckAnalysis' missing-attribute audit satisfied
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(lastIdAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.output, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // both sides cluster on the join key; Catalyst inserts (or reuses!)
  // the exchanges and sorts needed to satisfy these
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output.head)) ::
      ClusteredDistribution(Seq(right.output.head)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(0), Ascending),
      SortOrder(left.output(1), Ascending),
      SortOrder(left.output(2), Ascending)),
    Seq(SortOrder(right.output(0), Ascending),
      SortOrder(right.output(1), Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val types = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (evIter, qIter) =>
      val proj = UnsafeProjection.create(types)
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      // event cursor held as SCALARS — sort iterators reuse row buffers,
      // so holding an InternalRow reference across next() is unsound
      var haveEv = evIter.hasNext
      var eRow = if (haveEv) evIter.next() else null
      var eKey = if (haveEv) eRow.getLong(0) else 0L
      var eTs = if (haveEv) eRow.getLong(1) else 0L
      var eId = if (haveEv) eRow.getLong(2) else 0L
      var curKey = Long.MinValue
      var hasLast = false
      var lastId = 0L
      qIter.map { q =>
        val k = q.getLong(0)
        val at = q.getLong(1)
        if (k != curKey) { curKey = k; hasLast = false }
        // consume events up to and including the query instant; events of
        // keys with no queries stream past without emitting
        while (haveEv && (eKey < k || (eKey == k && eTs <= at))) {
          if (eKey == k) { hasLast = true; lastId = eId }
          haveEv = evIter.hasNext
          if (haveEv) {
            eRow = evIter.next()
            eKey = eRow.getLong(0); eTs = eRow.getLong(1); eId = eRow.getLong(2)
          }
        }
        out.update(0, k)
        out.update(1, at)
        if (hasLast) out.update(2, lastId) else out.update(2, null)
        proj(out)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
