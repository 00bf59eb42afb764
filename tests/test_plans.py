"""Physical-plan regression tests: the plans that make the operators
scale must stay the plans Catalyst picks — pushdown reaching parquet,
broadcast for anchors/dims, TakeOrderedAndProject for top-k.  Plan text
assertions are deliberately coarse (operator presence, not shapes)."""

import io
from contextlib import redirect_stdout

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    from graphraft_spark import registry

    registry.load_all()

    def get(name):
        q = registry.QUERIES.get(name) or registry.EXTRA_QUERIES[name]
        buf = io.StringIO()
        with redirect_stdout(buf):
            q(spark, SF).explain("formatted")
        return buf.getvalue()

    return get


def test_scan_pushdown_and_pruning(plans):
    p = plans("q_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in p
    # projection pruned to the 6 used columns — o_orderdate etc. absent
    assert "l_returnflag" in p and "l_orderkey" not in p


def test_topk_is_take_ordered(plans):
    p = plans("s_knn_topk")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.split("TakeOrderedAndProject")[0]


def test_anchor_joins_broadcast(plans):
    p = plans("g_onehop_enum")
    assert "BroadcastHashJoin" in p
    # no shuffle join needed for a 1-hop from a handful of anchors
    assert "SortMergeJoin" not in p


def test_dim_joins_broadcast_in_star_query(plans):
    p = plans("q_market_volume")
    assert "BroadcastHashJoin" in p


def test_anti_and_semi_joins(plans):
    assert ("LeftAnti" in plans("q_orders_without_lineitems")
            or "left_anti" in plans("q_orders_without_lineitems"))
    assert ("LeftSemi" in plans("q_priority_orders_semi")
            or "left_semi" in plans("q_priority_orders_semi"))


def test_no_cartesian_anywhere_heavy(plans):
    for name in ["g_twohop_enum", "r_retrieve_data", "d_minhash_lsh"]:
        p = plans(name)
        assert "CartesianProduct" not in p, name


def test_anchor_name_pushed_to_materialized_node_scan(plans):
    # the graph is materialized parquet; an instantiated pattern's anchor
    # name filter must reach the node scan as a parquet pushed filter
    p = plans("g_pattern_exec_2hop")
    assert "EqualTo(name,Customer#000000042)" in p
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_sft_export_is_scan_project_agg(plans):
    # the SFT table build is one gated projection: no joins, no Python
    p = plans("f_sft_llm1")
    assert "Join" not in p
    assert "EvalPython" not in p


def test_full_pipeline_no_cartesian(plans):
    assert "CartesianProduct" not in plans("p_full_pipeline")


def test_metrics_single_projection(plans):
    # per-row metrics must be a scan + project/agg — no joins, no UDFs
    p = plans("m_metrics_per_row")
    assert "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
