"""Brute-force / property equivalence for the round-5/6 operators whose
oracle rows check one dataset shape: random inputs here pin the SEMANTICS
(the same strategy as test_interval_overlap's brute-force join and
test_graph_properties' Tarjan reference)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.graph import (
    bfs_hops_per_source,
    undirected,
)
from flink_recommendation_system_spark.operators.similarity import (
    quantize_embeddings,
)
from flink_recommendation_system_spark.operators.training import (
    conversion_labels,
    negative_sampled_pairs,
)


def test_conversion_labels_match_bruteforce_on_random_events(spark):
    rng = random.Random(7)
    rows = []
    for eid in range(300):
        rows.append(
            (
                eid,
                rng.randrange(8),
                rng.choice(["click", "purchase", "view"]),
                rng.randrange(0, 20_000),
            )
        )
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, s long"
    )
    got = {
        r.event_id: r.converted
        for r in conversion_labels(ev, horizon_sec=3600).collect()
    }
    purchases = [(u, s) for _e, u, t, s in rows if t == "purchase"]
    for eid, u, t, s in rows:
        if t != "click":
            assert eid not in got
            continue
        expect = any(
            pu == u and s <= ps <= s + 3600 for pu, ps in purchases
        )
        assert got[eid] == expect, (eid, u, s)


def test_negative_sampling_invariants_on_random_positives(spark):
    rng = random.Random(11)
    pos_rows = sorted(
        {(rng.randrange(6), rng.randrange(30)) for _ in range(60)}
    )
    items_rows = [(i,) for i in range(30)]
    pos = spark.createDataFrame(pos_rows, "user_id long, product_id long")
    items = spark.createDataFrame(items_rows, "product_id long")
    out = negative_sampled_pairs(pos, items).collect()
    positives = {(r.user_id, r.product_id) for r in out if r.label == 1}
    negatives = {(r.user_id, r.product_id) for r in out if r.label == 0}
    assert positives == set(pos_rows)
    assert not (positives & negatives)
    per_user_pos: dict[int, int] = {}
    for u, _p in pos_rows:
        per_user_pos[u] = per_user_pos.get(u, 0) + 1
    per_user_neg: dict[int, int] = {}
    for u, _p in negatives:
        per_user_neg[u] = per_user_neg.get(u, 0) + 1
    for u, k in per_user_pos.items():
        avail = 30 - k
        assert per_user_neg.get(u, 0) == min(k, avail), u
    # determinism: second run identical
    out2 = negative_sampled_pairs(pos, items).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}


def test_per_source_bfs_matches_python_bfs(spark):
    rng = random.Random(5)
    n = 25
    edge_set = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40)
            if True
        }
    )
    edge_set = [(a, b) for a, b in edge_set if a != b]
    adj: dict[int, set[int]] = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sources = [0, 1, 2]
    expect = {}
    for s in sources:
        dist = {s: 0}
        frontier = [s]
        for h in (1, 2, 3):
            nxt = []
            for v in frontier:
                for w in adj.get(v, ()):
                    if w not in dist:
                        dist[w] = h
                        nxt.append(w)
            frontier = nxt
        for v, d in dist.items():
            expect[(s, v)] = d
    df = undirected(spark.createDataFrame(edge_set, ["src", "dst"]))
    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    got = {
        (r.source, r.id): r.hops
        for r in bfs_hops_per_source(df, src_df, max_hops=3).collect()
    }
    assert got == expect


def test_quantization_roundtrip_bound_on_random_vectors(spark):
    rng = random.Random(3)
    rows = []
    for vid in range(40):
        dim = 16
        vec = [rng.uniform(-5, 5) * rng.choice([1e-3, 1.0, 50.0]) for _ in range(dim)]
        if vid == 0:
            vec = [0.0] * dim
        rows.append((vid, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for r in quantize_embeddings(df).collect():
        orig = dict(rows)[r.id]
        assert len(r.qvec) == len(orig)
        assert all(-127 <= q <= 127 for q in r.qvec)
        if all(x == 0.0 for x in orig):
            assert r.scale == 0.0 and all(q == 0 for q in r.qvec)
            continue
        err = max(
            abs(x - q * r.scale) for x, q in zip(orig, r.qvec)
        )
        assert err <= r.scale / 2 + 1e-9 * max(abs(x) for x in orig)
        # scale reconstructs max|x| exactly at the pinned element
        assert math.isclose(
            r.scale * 127.0, max(abs(x) for x in orig), rel_tol=1e-12
        )


def test_prefix_filter_jaccard_lossless_vs_brute_force(spark):
    """The PPJoin prefix filter must return EXACTLY the brute-force
    Jaccard >= t pair set — losslessness of prefix + length filtering on
    random token-set corpora, at two thresholds."""
    from flink_recommendation_system_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    rng = random.Random(61)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for did in range(40):
        k = rng.randint(1, 12)
        toks = rng.sample(vocab, k)
        # plant some near-duplicates by copying a previous doc with a tweak
        if did % 5 == 4 and docs:
            base = docs[rng.randrange(len(docs))][1].split(" ")
            toks = base + ([rng.choice(vocab)] if rng.random() < 0.7 else [])
        docs.append((did, " ".join(toks), "en" if did % 3 else "de"))
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])

    sets = {d: (set(t.split(" ")), lang) for d, t, lang in docs}
    for tn, td in ((1, 2), (2, 3)):
        expected = set()
        for a in sets:
            for b in sets:
                if a >= b or sets[a][1] != sets[b][1]:
                    continue
                inter = len(sets[a][0] & sets[b][0])
                union = len(sets[a][0] | sets[b][0])
                if inter * td >= union * tn:
                    expected.add((a, b))
        got = {
            (r["a_id"], r["b_id"])
            for r in prefix_filter_jaccard_pairs(
                df, threshold_num=tn, threshold_den=td
            ).collect()
        }
        assert got == expected, f"t={tn}/{td}: {got ^ expected}"
