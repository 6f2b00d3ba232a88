package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene lint. Scala `Map` literals silently keep the LAST
  * binding for a duplicated key, so a query accidentally registered twice
  * (in one module or across modules) shadows the earlier one with no
  * compile- or run-time signal — the battery shrinks by one and nothing
  * fails. Caught in the wild: a second `text_repetition` landed in
  * TextQueries and silently replaced the original until the dumped-result
  * count came up short. This spec greps the main sources: every
  * registered query name may appear as a `"name" ->` binding at most
  * twice (its query lambda + its oracle SQL), and its lambda binding
  * exactly once. */
class QueryRegistrySpec extends AnyFunSuite {

  private lazy val mainSource: String = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => new String(Files.readAllBytes(p), "UTF-8"))
      .mkString("\n")
  }

  test("no registered query name is bound more than twice in main sources") {
    val bind = """"([a-z0-9_]+)"\s*->""".r
    val counts = bind.findAllMatchIn(mainSource).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val offenders = SparkEntry.queries.keySet.toSeq.sorted
      .map(k => k -> counts.getOrElse(k, 0))
      .filter { case (_, n) => n < 1 || n > 2 }
    assert(offenders.isEmpty,
      s"query keys bound an unexpected number of times (duplicate registration " +
        s"shadows silently): $offenders")
  }

  test("every registered query has exactly one query-lambda binding") {
    val lambda = """"([a-z0-9_]+)"\s*->\s*\{\s*\(s,\s*dir\)""".r
    val counts = lambda.findAllMatchIn(mainSource).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val dups = counts.filter(_._2 > 1)
    assert(dups.isEmpty, s"duplicate query lambdas: $dups")
    // every lambda-bound name must actually be reachable in the registry
    val unreachable = counts.keySet.diff(SparkEntry.queries.keySet)
    assert(unreachable.isEmpty,
      s"query lambdas bound but not registered (module not in SparkEntry?): $unreachable")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("the oracle-less (rows-only) set is exactly the documented three") {
    // rows-only is a WEAKER driver check, reserved for operators whose
    // semantics are not SQL-expressible (k-means / PQ codebooks / HLL
    // sketches — invariants pinned in suites instead; mm_features
    // graduated to a full oracle once its FNV fold proved expressible).
    // A new query missing its oracle must fail HERE, not slip into the
    // gate as a silent weak row.
    val documented = Set("ev_approx_stats", "knn_ivf_kmeans", "knn_ivfpq")
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly == documented,
      s"undocumented rows-only queries (add the oracle or the documented rationale): " +
        s"${rowsOnly.diff(documented)}; stale allowlist: ${documented.diff(rowsOnly)}")
  }
}
