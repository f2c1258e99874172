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
    # round-12 addition
    "semantic_dedup_ivf_refit",
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


def test_tiny_filter_matches_only_top_level_conjuncts():
    """VERDICT r11 item 2 / ADVICE r10 item 1: a `key < N` comparison
    inside NOT(...) or an OR branch bounds NOTHING and must not verify a
    broadcast build side as tiny; only a top-level AND conjunct that IS
    the comparison counts."""
    from plan_audit import _TINY_CONJUNCT, _strip_outer_parens, _top_conjuncts

    def tiny_bound(pred: str):
        for c in _top_conjuncts(pred):
            m = _TINY_CONJUNCT.match(_strip_outer_parens(c))
            if m and int(m.group(1)) <= 200:
                return int(m.group(1))
        return None

    # genuine contract-tiny shapes still verify
    assert tiny_bound("((isnotnull(vec_id#12L) AND (vec_id#12L < 10)))") == 10
    assert tiny_bound("(doc_id#3L < 200)") == 200
    assert (
        tiny_bound("(((x#1L > 3) AND (vec_id#2L < 50)) AND isnotnull(b#3))")
        == 50
    )
    # the false-verify shapes the old free-search regex accepted
    assert tiny_bound("NOT (vec_id#12L < 60)") is None
    assert tiny_bound("(NOT (vec_id#12L < 60))") is None
    assert tiny_bound("((vec_id#12L < 60) OR (doc_id#3L < 5))") is None
    assert (
        tiny_bound("(isnotnull(x#1) AND NOT (vec_id#12L < 60))") is None
    )
    assert (
        tiny_bound("(isnotnull(x#1) AND ((vec_id#2L < 9) OR (x#1 = 3)))")
        is None
    )
    # non-row-key columns never bound (ADVICE r09 rule preserved)
    assert tiny_bound("(user_id#4L < 10)") is None
