"""Round-15 optimization-round plan pins (OPTIMIZATION_r15.md).

Each test freezes the STRUCTURAL property an r15 optimization bought,
so a regression is caught by shape, not by timing noise.
"""

from __future__ import annotations

from tests.test_plans import node_count, plan_of


def test_q21_single_fact_pass(spark, sf_dir):
    """r15: the late-row count folds into the per-order aggregate
    (``sum(count_if(late))``), so lineitem⋈orders runs ONCE — the old
    join-back replayed the fact join (two lineitem + two orders scans).
    One scan per table, and no join of two data-scaled sides remains
    (the only join left is per-order stats ⋈ broadcast supplier)."""
    plan = plan_of("tpch_q21", spark, sf_dir)
    scans = [
        line
        for line in plan.splitlines()
        if line.lstrip().startswith("(") and "Scan parquet" in line
    ]
    assert len(scans) == 3, plan  # lineitem, orders, supplier — once each
    # the distinct-count rewrite from r12 must survive too
    assert node_count(plan, "Expand") == 0, plan


def test_cindex_single_fact_scan(spark, sf_dir):
    """r15: the (t, s) cell grid is persist()ed — its three consumers
    (dt spine, ds spine, dense left join) share one events scan + one
    per-user aggregate instead of replaying the fact lineage 3x."""
    plan = plan_of("ml_survival_cindex", spark, sf_dir)
    assert node_count(plan, "Scan parquet") == 1, plan
    assert "InMemoryRelation" in plan, plan
