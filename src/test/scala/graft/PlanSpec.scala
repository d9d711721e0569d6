package graft

import graft.silver.Silver
import graft.ops.{Analytics, TextOps}

/** Physical-plan regression guards: the scale properties the engine's
  * design depends on must be visible in the plan, not just intended. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("silver_orders: dimension broadcast + filter pushdown + pruning") {
    val p = plan(Silver.orders(spark, Sf0001))
    assert(p.contains("BroadcastHashJoin"), "customer side should broadcast")
    assert(p.contains("PushedFilters: [IsNotNull"), "join-key null filter should reach parquet")
    // customer scan must read only the two columns the model needs
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string>"),
      "customer scan should be pruned to c_custkey,c_name")
  }

  test("text_stats: documents scan prunes unused n_chars column") {
    val p = plan(TextOps.textStats(spark, Sf0001))
    assert(!p.contains("n_chars"), "n_chars is unused and must be pruned from the scan")
  }

  test("q5 star join: small dimensions broadcast, no cartesian products") {
    val p = plan(Analytics.nationRevenue(spark, Sf0001))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("emb_near_dup: banded candidates equi-join, no nested-loop/cartesian pairs") {
    val p = plan(graft.ops.Similarity.cosineNearDup(spark, Sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "near-dup candidates must come from the band equi-join, not an all-pairs loop")
    assert(!p.contains("CartesianProduct"))
  }

  test("ann exact baseline: pinned fixed-size query set, not a modulus") {
    assert(graft.ops.Similarity.AnnQueryIds.size == 20)
  }

  test("near-dup banding matches the static oracle at every verified SF") {
    import graft.ops.Similarity.{nearDupBandPlanes, NearDupBandPlanes}
    // embeddings rowcounts at sf0.001 / sf0.01 / sf0.1
    Seq(200L, 500L, 2000L).foreach(n =>
      assert(nearDupBandPlanes(n) == NearDupBandPlanes,
        s"oracle uses $NearDupBandPlanes planes; engine must agree at N=$n"))
    assert(nearDupBandPlanes(20000L) > NearDupBandPlanes,
      "adaptivity must engage beyond oracle-checked scales")
  }

  test("attribution interval join is an equi-join on user, not a cartesian") {
    val p = plan(graft.ops.Events.attribution(spark, Sf0001))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "user_id must be the equi key; the time range is a join filter")
  }

  test("whole-stage codegen covers the silver hot path") {
    // AQE prints codegen spans only in codegen explain mode pre-execution.
    val p = Silver.payments(spark, Sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen subtree"))
  }
}
