package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Guard against analyzed-plan TREE blowup in composed stage DAGs.
  *
  * `.cache()` bounds EXECUTION (the planner substitutes the
  * InMemoryRelation), but the ANALYZED logical plan still carries the
  * full expression tree — and Catalyst plans are trees, not DAGs, so a
  * frame that references a multi-reference upstream K times expands that
  * upstream K times, multiplicatively per stage. The failure mode is not
  * slow execution but driver death at plan FORMATTING time
  * (`QueryExecution.explainString` → `StringConcat.append` OOM) — plan
  * construction cost, independent of data size, so a bigger cluster
  * cannot save it (round-13 verdict, "What's wrong" #1). The fix is a
  * lineage cut at the stage boundary (`localCheckpoint(true)`, the
  * ConnectedComponents iteration doctrine, or a stage-to-parquet
  * round-trip); this guard is the PIN that the cut stays in place when
  * the next stage is added to the DAG.
  *
  * Counting is capped: traversing a genuinely blown tree is itself
  * O(blowup), so the walk aborts as soon as the cap is crossed rather
  * than enumerating millions of nodes before failing. */
object PlanGuard {

  /** Number of nodes in the analyzed logical plan, counted up to
    * `cap + 1` (a return of `cap + 1` means "over the cap"). */
  def nodeCount(plan: LogicalPlan, cap: Int): Int = {
    var n = 0
    def go(p: LogicalPlan): Boolean = {
      n += 1
      n <= cap && p.children.forall(go)
    }
    go(plan)
    n
  }

  def nodeCount(df: Dataset[_], cap: Int): Int =
    nodeCount(df.queryExecution.analyzed, cap)

  /** Fail loud (before any job runs) if a composed frame's analyzed plan
    * tree exceeds `cap` nodes. Call at every lineage-cut stage boundary:
    * a removed/forgotten checkpoint then fails HERE, with a named stage,
    * instead of OOM-ing the driver inside the explain listener. The cap
    * is deliberately generous — healthy composed stage plans in this
    * engine are O(100) nodes; a blowup is O(10^6+). */
  def assertBounded(df: Dataset[_], label: String, cap: Int = 10000): Unit = {
    val n = nodeCount(df, cap)
    require(n <= cap,
      s"plan-tree blowup at stage '$label': analyzed plan exceeds $cap nodes " +
        "— a lineage cut (localCheckpoint / stage-to-parquet) was removed or " +
        "a new stage multiplied an un-cut multi-reference upstream " +
        "(see PlanGuard scaladoc; ConnectedComponents.clustersPropagate is " +
        "the in-repo doctrine)")
  }
}
