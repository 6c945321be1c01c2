package graft

import graft.operators.Relational

/** Plan-shape assertions for the relational operators: the properties
  * that matter at 100 TB (pushdown, pruning, broadcast, no cartesian),
  * checked against the executed plan rather than trusted from scaladoc.
  */
class RelationalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame) = {
    val qe = df.queryExecution
    qe.executedPlan
  }

  test("q03 pushes filters and prunes columns at the parquet scan") {
    val plan = executedPlan(Relational.q03FilterProject(spark, sf)).toString
    // predicate pushdown reaches the data source
    assert(plan.contains("PushedFilters: ") && plan.contains("GreaterThan(l_quantity"), plan)
    // projection pruning: the read schema carries only referenced columns
    assert(plan.contains("ReadSchema: struct<l_orderkey"), plan)
    assert(!plan.contains("l_extendedprice") && !plan.contains("l_discount"), plan)
  }

  test("q02 broadcasts the small dimensions, never the fact side") {
    val plan = executedPlan(Relational.q02JoinMultiway(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("q13 sessionization uses a single user_id exchange for both windows") {
    val plan = executedPlan(Relational.q13Sessionize(spark, sf))
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // one shuffle for the user_id windows + aggregation, one for the
    // final presentation orderBy (range partitioning) — nothing else
    assert(exchanges.size <= 2, s"${exchanges.size} exchanges:\n$plan")
  }

  test("q09 returns non-empty anti-join results at the oracle scale factor") {
    // sf0.01 is where the driver's correctness gate runs
    assert(Relational.q09AntiSemiJoin(spark, "/root/testdata/sf0.01").limit(1).count() === 1L)
  }
}
