package graft

import org.apache.spark.sql.functions._

/** Physical-plan regression tests: the 100 TB properties (column pruning,
  * predicate pushdown, broadcast choice, whole-stage codegen) asserted on
  * the actual executed plans so a refactor can't silently regress them.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("reindex_join: orders scan prunes to 2 columns and broadcasts the agg side") {
    val plan = planOf("reindex_join")
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(plan.contains("ReadSchema: struct<o_custkey:bigint,o_totalprice:double>"),
      "orders scan should read only the join key + aggregated column")
  }

  test("vc_returnflag: scan prunes to the grouped column with pushed null filter") {
    val plan = planOf("vc_returnflag")
    assert(plan.contains("ReadSchema: struct<l_returnflag:string>"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag)]"))
  }

  test("diag_coo: row==col filter is pushed into the scan, not post-aggregation") {
    val plan = planOf("diag_coo")
    // the equality filter must appear before aggregation (scan-level Filter)
    assert(plan.contains("(l_suppkey") && plan.contains("= l_partkey"), plan.take(800))
    assert(plan.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint,l_quantity:double>")
      || plan.contains("ReadSchema: struct<l_suppkey:bigint,l_partkey:bigint,l_quantity:double>"))
  }

  test("aggregation queries run inside whole-stage codegen") {
    // AQE only shows codegen spans in the FINAL plan — execute first
    val df = SparkEntry.queries("weighted_avg")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in the final plan
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan.take(800))
  }

  test("topk_orders: global sort+limit compiles to TakeOrderedAndProject (no full sort)") {
    val plan = planOf("topk_orders")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("no query plan contains a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }
}
