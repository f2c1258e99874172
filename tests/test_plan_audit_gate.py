"""Standing CI gate for the physical-plan antipattern scan
(tools/plan_audit.py): a representative sample of the registered surface
— every operator family plus all round-7 additions — must stay free of
HARD antipatterns (CartesianProduct outside the MLlib-internal allowlist,
row-at-a-time Python). The full-surface scan runs as the CLI
(PLAN_AUDIT.md); this test keeps the invariant from silently regressing
between full runs."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SAMPLE = [
    # relational / window
    "pricing_summary", "revenue_by_nation", "min_cost_supplier",
    "customer_deciles",
    # graph (iterative + wedge families)
    "lpa_labels", "scc_components", "ktruss_edges", "betweenness_sampled",
    "pagerank",
    # dedup / similarity
    "minhash_near_dups", "fuzzy_name_pairs_d2", "ppjoin_pairs",
    "semantic_dedup_fixed", "hard_negative_mining", "mf_scoring_fixed",
    # text / BPE
    "subword_token_counts", "bpe_vocab", "bm25_topk",
    # mining / time series
    "basket_lift", "ewma_event_trend", "seasonal_decomposition",
    "zone_map_stats", "touch_attribution",
    # CF pipeline
    "user_recommendations", "serving_snapshot",
    # round-9 additions
    "semantic_dedup_ann", "kmeans_one_step", "ann_recall_report",
    "hybrid_retrieval_rrf", "t_closeness", "user_running_stats",
    # round-10 additions
    "semantic_dedup_ivf", "semantic_dedup_recall",
]


def test_sampled_plans_have_no_hard_antipatterns(spark):
    """HARD antipatterns gate + MECHANICAL waiver verification (VERDICT
    r08 item 4): every nested_loop / global_sort flag in the sample must
    structurally verify (bounded broadcast build side; aggregate-bounded
    single-partition input) or carry a named contract waiver."""
    from plan_audit import (
        CARTESIAN_BY_DESIGN,
        WAIVED_BY_CONTRACT,
        audit_plan,
        verify_waivers,
    )

    spec = importlib.util.spec_from_file_location(
        "entry_gate", os.path.join(REPO, "__spark_entry__.py")
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    qs = em.queries()
    missing = [n for n in SAMPLE if n not in qs]
    assert not missing, f"sample names drifted from the registry: {missing}"
    bad, unverified = [], []
    for name in SAMPLE:
        df = qs[name](spark, "/root/testdata/sf0.001")
        jplan = df._jdf.queryExecution().executedPlan()
        flags = audit_plan(jplan.toString())
        if (
            flags["cartesian"] and name not in CARTESIAN_BY_DESIGN
        ) or flags["python_row"]:
            bad.append((name, {k: v for k, v in flags.items() if v}))
        if flags["nested_loop"] or flags["global_sort"]:
            _ok, notok = verify_waivers(jplan)
            if notok and name not in WAIVED_BY_CONTRACT:
                unverified.append((name, notok))
    assert not bad, f"hard plan antipatterns: {bad}"
    assert not unverified, f"unverified plan waivers: {unverified}"
