package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the "would this survive 100×" checks:
  * filters reach the parquet scan, projections prune the read schema, small
  * dims broadcast, the session fold is a single shuffle.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // use sparkPlan (pre-AQE): AdaptiveSparkPlanExec hides leaves until final
  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no file scan in plan"))

  test("q01: null-encoding projection prunes columns and pushes the IN filter") {
    val df = SparkEntry.queries("q01_scan_project")(spark, sf)
    val scan = scanOf(df)
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read == Set("event_id", "user_id", "event_type", "value"),
      s"read schema should prune to used columns, got $read")
    assert(scan.metadata("PushedFilters").contains("In(event_type"),
      s"IN filter should push to parquet: ${scan.metadata("PushedFilters")}")
  }

  test("q02: range predicate pushes down to the scan") {
    val df = SparkEntry.queries("q02_filter_window")(spark, sf)
    val pushed = scanOf(df).metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range should push down: $pushed")
  }

  test("q08: dimension chain uses broadcast joins, never sort-merge") {
    val plan = SparkEntry.queries("q08_dim_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q09: fact join prunes lineitem read schema to the 2 used columns") {
    val df = SparkEntry.queries("q09_fact_join")(spark, sf)
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case s: FileSourceScanExec => s }
    val lineitemScan = scans.find(_.requiredSchema.fieldNames.contains("l_orderkey"))
      .getOrElse(fail("no lineitem scan"))
    assert(lineitemScan.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"))
  }

  test("session classify plan: exactly one shuffle (the groupByKey)") {
    import spark.implicits._
    val cfg = graft.cdc.GenConfig(numConversations = 10)
    val events = graft.cdc.ChangeLogGen.generate(spark, cfg)
    val plan = graft.cdc.CdcPipeline.classify(events, 0L)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles in:\n$plan")
  }

  test("whole-stage codegen covers the scan-side of q03 aggregation") {
    val df = SparkEntry.queries("q03_session_agg")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages are visible
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("codegen id"), s"no codegen span in:\n$plan")
  }
}
