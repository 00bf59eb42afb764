"""Static twin of plan_lint's global-Window rule (r10 advice): a
``Window.orderBy(...)`` with no partitionBy plans an Exchange
SinglePartition, but a lazy localCheckpoint truncates the plan to an
ExistingRDD so tools/plan_lint.py can never see it (that is exactly
how the r10 train_sgns vocab rank hid).  This test pins every global
window CONSTRUCTION in the package source to an allowlist whose
entries document their input bound — a new one fails here at
authoring time, before any plan exists."""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "graphraft_spark")

# file -> set of bounds; one entry per allowed Window.orderBy( site.
ALLOWED = {
    # two-pass distributed row_number / cumulative-weight offset
    # tables: <= shuffle-partition-count rows by construction
    # (_rank_vocab + _weighted_cdf)
    "graph/embeddings.py": 2,
    "graph/neo4j_csv.py": 1,
    # top-N rank fusion / head-N repair: bounded frames per contract
    "search/hybrid.py": 1,
    "ops/text_analysis.py": 1,
    # documented single-shard forms with named scalable twins
    "registry/textanalysis_queries.py": 1,
    "registry/tpch_queries2.py": 1,
    "data/ops.py": 1,
    # exact-quantile machinery: all three windows (gate cum + gate
    # total, rank cum-below/total) run over the VALUE HISTOGRAM,
    # bounded by the value domain, never the corpus (ops/quantile.py
    # module docstring)
    "ops/quantile.py": 3,
}


def test_every_global_window_is_allowlisted():
    hits = {}
    for root, _, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            n = len(re.findall(r"Window\.orderBy\(", open(path).read()))
            if n:
                hits[rel] = n
    assert hits == ALLOWED, (
        "global Window.orderBy sites changed — every site must be "
        "bounded-by-construction and documented, then reflected here "
        f"(and in plan_lint's GLOBAL_WINDOW_OK if registry-visible): "
        f"{hits} != {ALLOWED}")
