"""Hypothesis property tests for the round-7 operators: BPE training on
random weighted vocabularies, FastSS-2 losslessness on random low-alphabet
strings (collision-rich by construction), and k-truss fixpoint equality
against a pure-Python peel on random graphs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# --- BPE vs reference on random vocabs --------------------------------------


def _ref_bpe(vocab: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    strs = {w: "(" + ")(".join(w) + ")" for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in strs.items():
            toks = s[1:-1].split(")(")
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                counts[k] = counts.get(k, 0) + vocab[w]
        if not counts:
            break
        (x, y), _ = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((x, y))
        strs = {
            w: s.replace(f"({x})({y})", f"({x}{y})") for w, s in strs.items()
        }
    return merges


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    words=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_fit_random_vocabs(spark, words):
    """The distributed fit must equal the reference merge-for-merge on
    arbitrary weighted vocabularies — including repeated-character words
    where greedy-left pairing matters ('aaa' under (a,a))."""
    from flink_recommendation_system_spark.operators.bpe import bpe_fit

    df = spark.createDataFrame(list(words.items()), "word string, cnt long")
    assert bpe_fit(df, n_merges=5) == _ref_bpe(words, 5)


# --- FastSS-2 losslessness on collision-rich random strings ------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    names=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=7),
        min_size=2,
        max_size=10,
    )
)
def test_fastss2_lossless_random(spark, names):
    """Binary-alphabet strings maximize deletion-signature collisions and
    duplicate variants; output must STILL equal the quadratic brute
    force exactly (no dropped pairs, no phantom pairs, exact dists)."""
    from flink_recommendation_system_spark.operators.dedup import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "id long, s string"
    )
    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", max_dist=2).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j and _lev(a, b) <= 2
    }
    assert got == want


# --- k-truss vs reference peel on random graphs ------------------------------


def _ref_ktruss(edges: set[tuple[int, int]], k: int):
    E = set(edges)
    while True:
        adj: dict[int, set[int]] = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in E
        }
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return {e: sup[e] for e in E}
        E -= drop


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] < t[1]),
        min_size=0,
        max_size=20,
    ),
    k=st.sampled_from([3, 4, 5]),
)
def test_ktruss_random_graphs(spark, pairs, k):
    """Fixpoint equality with the reference peel on arbitrary small
    graphs for several k — exercises cascading removals and the empty
    fixpoint."""
    from flink_recommendation_system_spark.operators.graph import (
        ktruss_edges,
    )

    df = spark.createDataFrame(
        list(pairs) or [(0, 1)], "src long, dst long"
    )
    want = _ref_ktruss(pairs or {(0, 1)}, k)
    got = {
        (r["src"], r["dst"]): r["support"]
        for r in ktruss_edges(df, k=k, max_iterations=25).collect()
    }
    assert got == want
