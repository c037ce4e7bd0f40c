package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape assertions (SURVEY.md §5.2 item 3): semantics that live in
  * the physical plan — broadcast hints honored, predicates pushed to the
  * parquet scan, column pruning effective, limit+sort fused. These are the
  * 100 TB guarantees: each one is the difference between a plan that scales
  * and one that merely passes at sf0.001.
  */
class PlanSpec extends SparkSpec {

  private def physical(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan
  }

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("join_broadcast plans a BroadcastHashJoin (fact side never shuffles)") {
    val plan = physical("join_broadcast")
    val hasBhj = plan.collectWithSubqueries {
      case b: BroadcastHashJoinExec => b
      case a: AdaptiveSparkPlanExec => a
    }.nonEmpty
    assert(hasBhj || planString("join_broadcast").contains("BroadcastHashJoin"),
      s"expected broadcast hash join in:\n${planString("join_broadcast")}")
  }

  test("project_filter pushes the predicate into the parquet scan") {
    val s = planString("project_filter")
    assert(s.contains("PushedFilters") &&
      s.replaceAll("\\s+", " ").matches("(?s).*PushedFilters: \\[.*GreaterThan\\(l_quantity.*"),
      s"expected l_quantity filter pushed to scan in:\n$s")
  }

  test("scan_parquet prunes columns to the projected pair") {
    val s = planString("scan_parquet")
    assert(s.contains("ReadSchema"), s)
    val read = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("r_regionkey") && read.contains("r_name") &&
      !read.contains("r_comment"), s"unpruned scan: $read")
  }

  test("sort_limit_topk plans TakeOrderedAndProject (k-heap, no global sort)") {
    val s = planString("sort_limit_topk")
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("agg_groupby_max plans partial+final aggregation (map-side combine)") {
    val s = planString("agg_groupby_max")
    assert(s.contains("HashAggregate"), s)
    // partial then final: two HashAggregate operators around the exchange
    assert(s.linesIterator.count(_.contains("HashAggregate")) >= 2, s)
  }

  test("whole-stage codegen covers the flagship aggregation") {
    val s = planString("agg_groupby_max")
    assert(s.contains("WholeStageCodegen"), s)
  }

  test("queries/oracleSql contract: every oracle key has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries without queries: $dangling")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("single-shuffle windows: win_topk_per_group exchanges exactly once") {
    val plan = physical("win_topk_per_group")
    val exchanges = plan.collectWithSubqueries { case e: Exchange => e }
    // one shuffle for the window partition key; the final presentation
    // orderBy adds a range exchange — anything beyond 2 is a regression
    assert(exchanges.size <= 2,
      s"expected <=2 exchanges, got ${exchanges.size}:\n${planString("win_topk_per_group")}")
  }
}
