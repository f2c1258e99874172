"""Graph operators (SURVEY.md §2.7) — vertices/edges as DataFrames.

The reference uses Flink Gelly (`Graph<Long,Long,Double>`,
Recommendations.java:116-134; gelly dep pom.xml:73-77). We model a graph as
two DataFrames — ``edges(src, dst)`` and ``vertices(id, ...)`` — and express
every graph step as joins/aggregations so Catalyst plans them (GraphFrames
does the same; we hand-roll to stay dependency-free, SURVEY.md §7).

Scale notes (100 TB): the all-pairs co-review expansion (A3) is the skew
hazard — one product with 10⁴ reviewers yields 5×10⁷ pairs in a single group
(SURVEY.md §4 "Skew"). ``co_review_edges`` therefore supports a reviewer cap
(top-N reviewers per product by recency proxy) which bounds per-product
output to C(cap, 2); AQE skew-join splitting handles residual imbalance in
the self-join formulation. The LPA loop localCheckpoints per iteration to
truncate lineage — without it the plan doubles per superstep.
"""

from __future__ import annotations

import warnings

from ._util import pin_layout as _pin

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GOOD_RATING_THRESHOLD = 3.0  # Recommendations.java:172-176
BATCH_USER_CUTOFF = 1000  # Recommendations.java:153
LPA_ITERATIONS = 5  # Recommendations.java:105

# Default skew guard: bounds per-product pair fan-out to C(cap, 2) at scale.
# Chosen above BATCH_USER_CUTOFF (the reference's user filter bounds distinct
# reviewers per product to < 1000), so with reference semantics the cap NEVER
# binds — oracles stay pinned at every SF — while a hot key on a 100 TB corpus
# is still bounded. Pass None explicitly to uncap.
MAX_REVIEWERS_PER_PRODUCT = 1024

# Vertex-count ceiling below which the iterative ops broadcast the label
# relation into the per-superstep join instead of sort-merge-joining it:
# (id, label) longs at 1M rows ≈ 16 MB — comfortably broadcastable — and the
# big edge relation then never exchanges or sorts inside the loop (measured
# ~18% off a 5-superstep LPA on 1M edges). One count() job decides, like
# AQE's runtime re-plan but hoisted out of the loop since the vertex count
# never changes across iterations.
BROADCAST_LABELS_MAX = 1_000_000


def good_reviews(
    reviews: DataFrame,
    user_cutoff: int = BATCH_USER_CUTOFF,
    rating_threshold: float = GOOD_RATING_THRESHOLD,
) -> DataFrame:
    """Filters F1+F2 (Recommendations.java:153-154): users below the batch
    cutoff who rated the product above the 'good' threshold. Returns the
    distinct (user_id, product_id) bipartite 'liked' relation.

    NULL product ids are excluded (round 15, oracle twin LIKED_CTE):
    the co-review equi-joins never matched them anyway, but bipartite
    consumers use product_id AS A VERTEX (kcore/ANF offset ids) where a
    NULL endpoint corrupted per-vertex HLL register tables.
    """
    return (
        reviews.filter(F.col("user_id") < user_cutoff)
        .filter(F.col("rating") > rating_threshold)
        .filter(F.col("product_id").isNotNull())
        .select("user_id", "product_id")
        .distinct()
    )


def co_review_edges(
    liked: DataFrame,
    max_reviewers_per_product: int | None = MAX_REVIEWERS_PER_PRODUCT,
) -> DataFrame:
    """All unordered pairs of users who liked the same product — the
    reference's `CreateSimilarUserEdges` group-reduce
    (Recommendations.java:157-170) + `.distinct()` (:125).

    Spark-first: a self-equi-join on product_id with ``src < dst`` (SURVEY.md
    §2.3 A3 option a) — Catalyst picks hash/broadcast strategy and AQE splits
    skewed keys, vs. a single-task hotspot in the group-reduce formulation.

    ``max_reviewers_per_product`` caps the per-product reviewer set (top-N by
    user_id for determinism) so pair blowup is bounded at scale. The default
    is on (``MAX_REVIEWERS_PER_PRODUCT``) but sized above the reference's
    user cutoff, so it never alters reference semantics; pass ``None`` to
    uncap.
    """
    # Pin the pre-join layout on the join key: the liked relation arrives
    # from a distinct/window exchange that AQE coalesces to ONE partition
    # at reference scale, which serialized the whole pair-expansion
    # self-join on one core (measured 2.5 → 0.4 s for the 497 k-pair
    # expansion at sf0.1; serving/recommendations inherit the win) — see
    # _util.pin_layout. Round-16 note: hoisting the pin ABOVE the cap
    # window (to share one exchange across window+cap+join, guide §2.4)
    # was tried and MEASURED WORSE downstream (user_recommendations best
    # 3.6 → 5.1 s, connected_components 3.2 → 5.1 s at sf0.1): the
    # window over the pinned 32-partition layout leaves 32 sorted
    # partitions whose self-join then plans as a sort-merge over the
    # wide pair expansion, where the post-window re-pin feeds AQE a
    # fresh exchange it can hash-join and skew-split. Kept in the
    # measured (pin-after) order.
    if max_reviewers_per_product is not None:
        w = Window.partitionBy("product_id").orderBy(F.col("user_id").asc())
        liked = (
            liked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_reviewers_per_product)
            .drop("_rn")
        )
    liked = _pin(liked, "product_id")
    a = liked.alias("a")
    b = liked.alias("b")
    return (
        a.join(b, "product_id")
        .filter(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("src"),
            F.col("b.user_id").alias("dst"),
        )
        .distinct()
    )


def undirected(edges: DataFrame) -> DataFrame:
    """Edge set union with its reversal — Gelly ``getUndirected()``
    (Recommendations.java:121; SURVEY.md §2.6 U1). Input is assumed deduped;
    with src<dst pairs the two directions never collide, so no re-distinct.
    """
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def induced_vertices(edges: DataFrame) -> DataFrame:
    """Vertex set induced from edge endpoints — ``Graph.fromDataSet``
    (Recommendations.java:116-122,128-134; SURVEY.md §2.4 J2).

    Expects *undirected* (both-direction) edges, so distinct src suffices.
    """
    return edges.select(F.col("src").alias("id")).distinct()


def _truncate_lineage(df: DataFrame, mode: str) -> DataFrame:
    """Cut the plan lineage between iterative supersteps.

    ``mode``: ``"local"`` → ``localCheckpoint`` (executor-local blocks; fast
    but non-replicated — an executor loss mid-loop kills the job);
    ``"reliable"`` → ``checkpoint`` to the configured checkpoint directory
    (survives executor loss — what a real cluster run wants); ``"auto"`` →
    reliable iff ``sparkContext.setCheckpointDir`` has been called, local
    otherwise.
    """
    if mode == "auto":
        sc = df.sparkSession.sparkContext
        mode = "reliable" if sc.getCheckpointDir() else "local"
    if mode == "reliable":
        return df.checkpoint(eager=True)
    if mode == "local":
        # lazy (round 16): the eager form ran one EXTRA materialization
        # job per superstep; with eager=False the checkpoint materializes
        # inside the NEXT superstep's first job (broadcast build /
        # aggregation) — same lineage truncation, one job per superstep
        # instead of two (guide §1.2: remove work, then tune)
        return df.localCheckpoint(eager=False)
    raise ValueError(f"unknown checkpoint mode {mode!r}")


def label_propagation(
    undirected_edges: DataFrame,
    iterations: int = LPA_ITERATIONS,
    checkpoint: str = "auto",
    broadcast_labels: bool | None = None,
) -> DataFrame:
    """Community detection — Gelly ``LabelPropagation(5)``
    (Recommendations.java:100-106), hand-rolled as a driver-side loop of
    DataFrame iterations (SURVEY.md §2.7 G3).

    Semantics per superstep (synchronous): every vertex adopts the most
    frequent label among its neighbors' *previous* labels; ties break toward
    the larger label (Gelly's tie-break). Initial label = vertex id — unique
    per vertex by construction, equivalent to the reference's
    ``zipWithUniqueId`` initialization (SURVEY.md §7 'semantic deltas').

    Returns ``(id, label)``. Each iteration is join → count per (id, label)
    → ``max_by`` argmax; ``localCheckpoint`` truncates lineage between
    supersteps.

    Physical design: the argmax is ``max_by(label, struct(cnt, label))`` —
    struct ordering is (count, label) lexicographic, exactly the Gelly
    tie-break — instead of a window ``row_number``: both aggregations get
    map-side partial aggregation and there is NO sort anywhere in the loop.
    ``broadcast_labels`` (None = auto by vertex count, see
    ``BROADCAST_LABELS_MAX``) broadcasts the label relation into the
    superstep join so the big edge relation never exchanges or sorts inside
    the loop; the only remaining shuffle per iteration is the bounded
    partial-aggregation exchange. For vertex sets too big to broadcast the
    join falls back to sort-merge, where the edge relation is shuffled to
    its join distribution while only the small side changes per iteration.

    ``checkpoint`` selects the lineage-truncation tier per superstep — see
    ``_truncate_lineage``.
    """
    edges = _truncate_lineage(
        undirected_edges.select("src", "dst"), checkpoint
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    if broadcast_labels is None:
        broadcast_labels = labels.count() <= BROADCAST_LABELS_MAX
    for _ in range(iterations):
        lab = F.broadcast(labels) if broadcast_labels else labels
        labels = _truncate_lineage(
            edges.join(lab, edges["src"] == lab["id"], "inner")
            .select(F.col("dst").alias("id"), "label")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("id")
            .agg(
                F.max_by(
                    "label", F.struct(F.col("cnt"), F.col("label"))
                ).alias("label")
            ),
            checkpoint,
        )
    return labels


def connected_components(
    undirected_edges: DataFrame,
    max_iterations: int = 20,
    checkpoint: str = "auto",
    convergence_check_interval: int = 3,
    on_no_convergence: str = "warn",
    broadcast_labels: bool | None = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation: every vertex
    repeatedly adopts min(own label, neighbors' labels) until fixpoint.
    Returns (id, component) where component = min vertex id in the component.

    The second iterative graph operator (beyond LPA) a graph workload needs;
    same physical shape: join → partial-aggregated min → lineage truncation
    (see ``_truncate_lineage``; ``checkpoint`` as in LPA), driver only
    orchestrates the loop. For web-scale graphs the large-star/small-star
    variant halves the iteration count; min-propagation converges in
    O(diameter) which is ≤ 5 on co-review-style graphs.

    Convergence is checked every ``convergence_check_interval`` iterations
    rather than every iteration — per-vertex components are monotonically
    non-increasing, so "state unchanged across the whole window" ⇔ fixpoint,
    and the driver launches ~1/k of the comparison jobs. If the loop
    exhausts ``max_iterations`` without reaching the fixpoint the result is
    WRONG for graphs of diameter > max_iterations; ``on_no_convergence``
    picks ``"warn"`` (UserWarning) or ``"raise"`` (RuntimeError).
    ``broadcast_labels`` as in ``label_propagation``.
    """
    if convergence_check_interval < 1:
        raise ValueError("convergence_check_interval must be >= 1")
    edges = _truncate_lineage(
        undirected_edges.select("src", "dst"), checkpoint
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    if broadcast_labels is None:
        broadcast_labels = labels.count() <= BROADCAST_LABELS_MAX
    reference = labels  # state at the last convergence check
    converged = False
    for i in range(1, max_iterations + 1):
        lab = F.broadcast(labels) if broadcast_labels else labels
        neighbor_min = (
            edges.join(lab, edges["src"] == lab["id"], "inner")
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = _truncate_lineage(
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            ),
            checkpoint,
        )
        if i % convergence_check_interval == 0 or i == max_iterations:
            changed = (
                labels.alias("n")
                .join(reference.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            if changed == 0:
                converged = True
                break
            reference = labels
    if not converged:
        msg = (
            f"connected_components stopped after max_iterations="
            f"{max_iterations} without reaching a fixpoint; components are "
            f"incomplete for graphs of diameter > {max_iterations}. "
            "Raise max_iterations."
        )
        if on_no_convergence == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, UserWarning, stacklevel=2)
    return labels


def connected_components_star(
    undirected_edges: DataFrame,
    max_rounds: int = 25,
    checkpoint: str = "auto",
    on_no_convergence: str = "warn",
) -> DataFrame:
    """Connected components by large-star/small-star alternation — the
    web-scale algorithm (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14): converges in O(log² n) rounds *independent of
    graph diameter*, where plain min-propagation needs O(diameter)
    iterations. Same output contract as ``connected_components``:
    (id, component), component = min vertex id (equality asserted in tests).

    Per round, the edge set itself is rewritten toward a star per component:

    - **large-star**: every node points its larger neighbors at the minimum
      of its neighborhood (including itself);
    - **small-star**: every node folds its smaller-or-equal neighbors onto
      that minimum.

    Vertices whose only incident edges are self-loops (or that appear only
    as ``(v, v)``) are preserved: the iteration works on the self-loop-free
    edge set, and the final mapping unions every input endpoint back in
    with component = itself as the fallback — so the output contract
    matches ``connected_components`` on ALL inputs, not just loop-free
    ones.

    Physical shape per round: two groupBy-min aggregations (partial,
    bounded by node count) + two equi-joins back to the neighbor list —
    all shuffle-by-key, no driver data. Convergence = edge-set fingerprint
    (count + XOR of pair hashes) unchanged, one tiny driver round-trip per
    round. ``checkpoint`` as in ``label_propagation``.
    """
    # One materialized pass over the input pair projection: the iteration
    # consumes the self-loop-free canonical edges; the (rare) self-loop-only
    # vertices are recovered from the same materialization at the end
    # without re-evaluating the (possibly expensive) input lineage.
    base = _truncate_lineage(
        undirected_edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ),
        checkpoint,
    )
    loop_ids = (
        base.filter(F.col("a") == F.col("b"))
        .select(F.col("a").alias("id"))
        .distinct()
    )
    # canonical undirected pair list: a < b, no self-loops
    E = _truncate_lineage(
        base.filter(F.col("a") != F.col("b")).distinct(), checkpoint
    )

    def fingerprint(edges: DataFrame) -> tuple:
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def canonical(pairs: DataFrame) -> DataFrame:
        return (
            pairs.select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    prev_fp = fingerprint(E)
    converged = False
    for _ in range(max_rounds):
        # large-star: neighbors of u (both directions); m = min(N(u) ∪ {u});
        # emit (v, m) for v > u
        nbrs = E.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            E.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
        )
        # no lineage truncation between the two half-steps: the large-star
        # edge set is consumed once, immediately, by small-star — only the
        # per-ROUND result needs materializing (measured: halves the job
        # count of the loop; same fixpoint).
        # Round 17 negative result (A/B'd, kept the faster): REMOVING
        # this distinct (small-star's min-agg is multiplicity-insensitive
        # and its canonical() re-dedups, so the per-round edge SET is
        # unchanged) measured ~10% SLOWER on the dense co-review graph —
        # large-star output is duplicate-heavy there, and the distinct's
        # map-side partial dedup shrinks the small-star join's shuffle by
        # more than the saved exchange costs. Same trade at 100 TB: LSH
        # near-clique graphs duplicate even harder.
        E = canonical(large)

        # small-star: orient edges toward the larger endpoint; m = min of
        # the strictly-smaller neighborhood ∪ {u}; emit (v, m) for the
        # smaller neighbors plus (u, m)
        nbrs2 = E.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins2 = nbrs2.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            nbrs2.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .union(
                mins2.select(F.col("u").alias("x"), F.col("m").alias("y"))
            )
        )
        E = _truncate_lineage(canonical(small), checkpoint)

        fp = fingerprint(E)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        msg = (
            f"connected_components_star did not stabilize within "
            f"max_rounds={max_rounds}; components may be incomplete."
        )
        if on_no_convergence == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, UserWarning, stacklevel=2)
    # At the fixpoint every edge links a component's min (a) to a member
    # (b): labels = members → a, plus the roots themselves; vertices that
    # never entered E (only incident to self-loops) are appended with
    # component = themselves, matching connected_components.
    mapping = (
        E.select(F.col("b").alias("id"), F.col("a").alias("component"))
        .union(E.select(F.col("a").alias("id"), F.col("a").alias("component")))
        .distinct()
    )
    loop_only = loop_ids.join(mapping.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return mapping.unionByName(loop_only)


def contracted_components(
    undirected_edges: DataFrame,
    checkpoint: str = "auto",
    max_rounds: int = 20,
    on_no_convergence: str = "warn",
) -> DataFrame:
    """``connected_components_star`` with ONE fused min-neighbor
    contraction round in front — the dense-graph accelerator for near-dup
    pair graphs, where LSH emits near-CLIQUES (every doc in a cluster
    pairs with most others; measured 374 800 pairs over ~5 000 clustered
    docs at sf0.1).

    The fused round is a Borůvka step as one partial aggregate:
    label0(v) = min(N(v) ∪ {v}) over the edge list, then every edge is
    relabeled to (label0(u), label0(v)) and same-label edges drop. On a
    clique the residual is EMPTY — the whole heavy edge volume is
    consumed by a single map-side-combinable groupBy-min instead of
    log²(n) star rounds — and star-CC finishes whatever sparse residue
    remains. Exactness: (v, label0(v)) is an edge (or identity), so the
    contraction stays within components, and the component's global min m
    keeps label0(m) = m, so residual component ids ARE the original min
    ids. Input contract: BOTH-DIRECTION edges (``undirected``'s output,
    the same contract as ``connected_components``/``label_propagation`` —
    label0 groups on ``src``, so a one-direction pair list would leave
    dst-only vertices unlabeled; ``connected_components_star`` is the
    member of the family that also canonicalizes raw pair lists).
    Output contract on such inputs identical to both CC forms
    (self-loops included); equivalence property-tested on random graphs.
    """
    edges = _truncate_lineage(
        undirected_edges.select("src", "dst"), checkpoint
    )
    label0 = _truncate_lineage(
        edges.groupBy("src")
        .agg(F.min("dst").alias("_m"))
        .select(
            F.col("src").alias("id"),
            F.least("src", "_m").alias("l0"),
        ),
        checkpoint,
    )
    # the label map is |V|-sized (the pair graph's clustered vertices) —
    # broadcast it under the same cap as the iterative loops
    lab = (
        F.broadcast(label0)
        if label0.count() <= BROADCAST_LABELS_MAX
        else label0
    )
    residual = _truncate_lineage(
        edges.join(lab, edges["src"] == lab["id"])
        .select(F.col("l0").alias("src"), "dst")
        .join(
            lab.select(F.col("id").alias("dst"), F.col("l0").alias("_ld")),
            "dst",
        )
        .select("src", F.col("_ld").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct(),
        checkpoint,
    )
    # Fast path (round 16): on near-clique inputs — exactly the LSH
    # near-dup graphs this operator exists for — the fused contraction
    # consumes EVERY edge and the residual is empty, yet star-CC still
    # paid its base/E checkpoints, fingerprints and one full round of
    # empty-relation jobs (~8 driver rounds). One take(1) on the
    # materialized residual skips all of it; with an empty residual the
    # star-CC mapping is empty and the final coalesce reduces to l0.
    if not residual.take(1):
        return label0.select("id", F.col("l0").alias("component"))
    comp = connected_components_star(
        residual,
        checkpoint=checkpoint,
        max_rounds=max_rounds,
        on_no_convergence=on_no_convergence,
    )
    return (
        label0.join(comp, label0["l0"] == comp["id"], "left")
        .select(
            label0["id"],
            F.coalesce("component", F.col("l0")).alias("component"),
        )
    )


def pagerank(
    undirected_edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: str = "auto",
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """Power-iteration PageRank over the (undirected → both-direction)
    edge set: ``pr'(v) = (1-d)/N + d·Σ_{u→v} pr(u)/outdeg(u)``. Returns
    (id, rank) rounded to 6 dp.

    Cross-engine EXACT arithmetic: each contribution ``pr(u)/outdeg(u)`` is
    quantized to the 2^-38 binary grid (``floor(x·2^38 + 0.5) / 2^38``)
    before the per-destination sum. Multiples of 2^-38 below 1 sum EXACTLY
    in IEEE doubles for up to 2^15 terms (38+15 = 53 significand bits), so
    the sum is order-independent and the DuckDB unrolled-CTE oracle matches
    bit-for-bit at every iteration — parity by construction, not by noise
    margin (quantization error ~deg·2^-38 ≈ 1e-8, far below the 6 dp output
    grain). Exactness holds to in-degree 32768; beyond that the sum merely
    reverts to ulp-noise territory, still far inside the output rounding.

    Every vertex of an undirected graph has in- and out-edges, so there is
    no dangling-mass term. Physical shape per iteration mirrors LPA: the
    (big) edge relation joins the (small) rank relation — broadcast when
    the vertex count allows (``BROADCAST_LABELS_MAX``) — then one
    partial-aggregated sum per destination; lineage truncated per
    iteration (``checkpoint`` as in ``label_propagation``).
    """
    edges = _truncate_lineage(
        undirected_edges.select("src", "dst"), checkpoint
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    verts = edges.select(F.col("src").alias("id")).distinct()
    n = verts.count()
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    if broadcast_ranks is None:
        broadcast_ranks = n <= BROADCAST_LABELS_MAX
    weighted = edges.join(outdeg, "src")  # (src, dst, outdeg), static
    weighted = _truncate_lineage(weighted, checkpoint)
    grid = float(1 << 38)
    for _ in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = F.col("rank") / F.col("outdeg")
        quant = (
            F.floor(contrib * F.lit(grid) + F.lit(0.5)).cast("double")
            / F.lit(grid)
        )
        ranks = _truncate_lineage(
            weighted.join(r, weighted["src"] == r["id"], "inner")
            .select(F.col("dst").alias("id"), quant.alias("contrib"))
            .groupBy("id")
            .agg(
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.sum("contrib")
                ).alias("rank")
            ),
            checkpoint,
        )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def pagerank_weighted(
    weighted_edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: str = "auto",
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """Weighted power-iteration PageRank over a both-direction edge
    relation ``(src, dst, w BIGINT)``:
    ``pr'(v) = (1−d)/N + d·Σ_{u→v} pr(u)·w(u,v)/W(u)`` with
    ``W(u) = Σ w(u,·)`` — edge strength (e.g. co-review COUNT) steers the
    walk instead of plain adjacency. Same exact-arithmetic contract as
    ``pagerank``: each contribution ``rank·w/W`` (one multiply, one
    divide — both IEEE-deterministic on integer-valued weights) is
    quantized to the 2^-38 grid before the per-destination sum, so the
    unrolled DuckDB oracle matches bit-for-bit per iteration.

    Physical shape per iteration identical to ``pagerank``; the weight
    column adds one BIGINT to the static edge relation and nothing to the
    shuffle count."""
    edges = _truncate_lineage(
        weighted_edges.select("src", "dst", "w"), checkpoint
    )
    wout = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    verts = edges.select(F.col("src").alias("id")).distinct()
    n = verts.count()
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    if broadcast_ranks is None:
        broadcast_ranks = n <= BROADCAST_LABELS_MAX
    weighted = _truncate_lineage(edges.join(wout, "src"), checkpoint)
    grid = float(1 << 38)
    for _ in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            F.col("rank")
            * F.col("w").cast("double")
            / F.col("wout").cast("double")
        )
        quant = (
            F.floor(contrib * F.lit(grid) + F.lit(0.5)).cast("double")
            / F.lit(grid)
        )
        ranks = _truncate_lineage(
            weighted.join(r, weighted["src"] == r["id"], "inner")
            .select(F.col("dst").alias("id"), quant.alias("contrib"))
            .groupBy("id")
            .agg(
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.sum("contrib")
                ).alias("rank")
            ),
            checkpoint,
        )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


MAX_WEDGES_SOURCE_DEGREE = 256


def triangles_per_vertex(
    undirected_edges: DataFrame,
    max_oriented_degree: int | None = None,
) -> DataFrame:
    """Triangle participation count per vertex (vertices in ≥1 triangle):
    (id, triangles). Integer counts → engine-exact oracle.

    Physical design — the degree-ordered orientation trick: orient every
    edge toward the endpoint with the larger (degree, id) key, so each
    vertex's out-degree is O(√m) even on power-law graphs (a hub's edges
    point INTO it, so the hub never enumerates its neighbor pairs). Wedges
    are the self-join of the oriented edge list on the source; a wedge
    (v1, v2) closes a triangle iff the oriented edge (v1, v2) exists —
    one more equi-join. The triangle SET is orientation-independent, so the
    DuckDB oracle uses the simpler id-ordered formulation and results match
    exactly.

    Near-clique guard (opt-in): orientation defeats power-law hubs but
    NOT near-cliques, where every vertex keeps oriented out-degree Θ(n) and
    triangle LISTING is inherently output-bound at Θ(n³) wedges (measured
    73 s on the sf0.1 co-review graph — PERFORMANCE.md). Counts are EXACT
    by default (``max_oriented_degree=None``), matching the exact-by-default
    contract of the reference frameworks' triangle counters. Scale-sensitive
    callers opt in by passing a cap (``MAX_WEDGES_SOURCE_DEGREE=256`` is the
    recommended value: C(256, 2) wedges per vertex, never binds on graphs of
    ≤ 257 vertices): each vertex's neighbor list is then truncated to the
    ``max_oriented_degree`` smallest out-neighbors (deterministic), counts
    become a LOWER BOUND, and a UserWarning reports the EXACT number of
    clipped vertices so the approximation is quantified, not just flagged.
    """
    E = (
        undirected_edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        E.select(F.col("a").alias("v"))
        .union(E.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    keyed = E.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint()
    if max_oriented_degree is not None:
        # The caller opted into the cap, so pay one exact partial-agg count
        # of over-cap vertices: the warning then QUANTIFIES the truncation
        # (clipped-vertex count) instead of merely flagging it.
        clipped = (
            oriented.groupBy("u")
            .agg(F.count(F.lit(1)).alias("odeg"))
            .filter(F.col("odeg") > max_oriented_degree)
            .count()
        )
        if clipped:
            warnings.warn(
                f"triangles_per_vertex: {clipped} vertices exceed "
                f"max_oriented_degree={max_oriented_degree} (near-clique "
                "region); clipped neighbor lists make triangle counts a "
                "lower bound. Pass max_oriented_degree=None for exact "
                "counts (output-bound on near-cliques).",
                UserWarning,
                stacklevel=2,
            )
            wcap = Window.partitionBy("u").orderBy(F.col("v").asc())
            oriented = (
                oriented.withColumn("_rn", F.row_number().over(wcap))
                .filter(F.col("_rn") <= max_oriented_degree)
                .drop("_rn")
                .localCheckpoint()
            )

    w1 = oriented.select("u", F.col("v").alias("v1"))
    w2 = oriented.select("u", F.col("v").alias("v2"))
    wedges = w1.join(w2, "u").filter(F.col("v1") != F.col("v2"))
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    triangles = wedges.join(closing, ["v1", "v2"])  # each triangle once

    corners = (
        triangles.select(F.col("u").alias("id"))
        .union(triangles.select(F.col("v1").alias("id")))
        .union(triangles.select(F.col("v2").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))


def community_sizes(labels: DataFrame) -> DataFrame:
    """`SELECT label, COUNT(*) GROUP BY label` — the reference's diagnostic
    group-reduce (Recommendations.java:83-98; SURVEY.md §2.3 A2).
    """
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("community_size"))


def kcore_vertices(
    undirected_edges: DataFrame,
    k: int,
    max_iterations: int = 30,
    checkpoint: str = "auto",
    on_no_convergence: str = "warn",
    broadcast_removed_max: int = 5_000_000,
) -> DataFrame:
    """k-core decomposition by parallel peeling: repeatedly delete every
    vertex of degree < k (all at once per round) until fixpoint; the
    surviving subgraph is the k-core. Returns (id, core_degree) — degree
    WITHIN the core, all >= k. The fixpoint is removal-order-independent,
    which is what makes the operator engine-exact despite being iterative.

    Expects *undirected* (both-direction, deduped) edges like the other
    iterative ops, so per-src counts are full degrees.

    Physical shape — anti-join against the REMOVED set, not semi-join
    against the survivors: per round the removed frontier is small (and
    shrinks geometrically on real degree distributions), so it broadcasts
    (``broadcast_removed_max`` cap, counted exactly by the loop-control
    action) and each round is two broadcast anti-joins over the edge list —
    the big side never shuffles. The survivor-side semi-join formulation
    would shuffle the whole edge list every round. Degree counts are
    partial-aggregated; lineage is truncated per round (``checkpoint`` as
    in ``label_propagation``).

    Rounds needed can reach O(n) on pathological chains; ``max_iterations``
    bounds the loop and ``on_no_convergence`` ("warn" | "raise") reports a
    non-fixpoint exit, where the result is a SUPERSET of the true k-core
    (peeling is monotone — vertices only ever leave).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    edges = _truncate_lineage(
        undirected_edges.select("src", "dst"), checkpoint
    )
    converged = False
    deg = None
    for _i in range(max_iterations):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        deg = _truncate_lineage(deg, checkpoint)
        removed = deg.filter(F.col("deg") < k).select("src")
        n_removed = removed.count()  # scalar loop control, not a data path
        if n_removed == 0:
            converged = True
            break
        if n_removed <= broadcast_removed_max:
            removed = F.broadcast(removed)
        edges = _truncate_lineage(
            edges.join(removed, "src", "left_anti").join(
                removed.withColumnRenamed("src", "dst"), "dst", "left_anti"
            ),
            checkpoint,
        )
    if not converged:
        msg = (
            f"kcore_vertices stopped after max_iterations={max_iterations} "
            "without reaching the peeling fixpoint; the result is a "
            "superset of the true k-core. Raise max_iterations."
        )
        if on_no_convergence == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, UserWarning, stacklevel=2)
        # deg was computed before the final removal — refresh it so the
        # reported degrees at least reflect the last surviving edge set
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return deg.select(
        F.col("src").alias("id"), F.col("deg").alias("core_degree")
    )


def _bidirectional_min_reach(
    edges: DataFrame,
    vertices: DataFrame,
    checkpoint: str,
    max_iterations: int,
    on_no_convergence: str,
    broadcast_labels: bool,
) -> DataFrame:
    """Both directed min-reach fixpoints at once: f(v) = min id REACHABLE
    FROM v (labels flow dst→src) and b(v) = min id that REACHES v (labels
    flow src→dst). Output: (id, f_label, b_label).

    The two fixpoints run over the same edge list, so one propagation
    relation carries both directions (``dir`` 0 = forward, 1 = backward)
    and each superstep is ONE join + partial-agg job over 2|E| rows
    instead of two sequential |E| jobs — on overhead-dominated iterative
    workloads (small dense graphs, many supersteps) this halves the
    per-superstep fixed cost (scheduling, broadcast, lineage truncation).

    Propagation is FRONTIER-SHRINKING (VERDICT r06 item 4 — the
    ``kcore_vertices`` shrinking trick applied to min-propagation): only
    the (id, dir) rows whose label DECREASED last superstep re-propagate.
    Sound because min is idempotent and an unchanged label already
    delivered its contribution in the superstep it last changed, so the
    edge join touches |frontier|-many label rows instead of 2|V| — and
    on min-reach fixpoints the frontier collapses geometrically after
    the first few supersteps. Convergence is exact: an empty frontier IS
    the fixpoint (labels are monotone non-increasing), and the frontier
    count doubles as the per-superstep scalar loop control — same one
    action per superstep as the old decimal-sum fingerprint."""
    # labels and prop are NARROW projections of the caller's
    # already-lineage-truncated vertices/edges — re-materializing them
    # here bought nothing (measured: two extra ~0.2 s localCheckpoint
    # jobs per round at sf0.1); recomputing the projection inside each
    # superstep join is a codegen'd map over checkpointed data
    labels = vertices.select("id").withColumn(
        "dir", F.explode(F.array(F.lit(0), F.lit(1)))
    ).withColumn("label", F.col("id"))
    prop = edges.select(
        F.lit(0).alias("dir"),
        F.col("dst").alias("from_id"),
        F.col("src").alias("to_id"),
    ).unionByName(
        edges.select(
            F.lit(1).alias("dir"),
            F.col("src").alias("from_id"),
            F.col("dst").alias("to_id"),
        )
    )
    frontier = labels  # superstep 0: every vertex is "freshly changed"
    converged = False
    for _i in range(max_iterations):
        fl = frontier.select(F.col("id").alias("from_id"), "dir", "label")
        if broadcast_labels:
            # the frontier only shrinks, so the hoisted whole-vertex-set
            # decision stays a safe upper bound for every superstep
            fl = F.broadcast(fl)
        nbr_min = (
            prop.join(fl, ["from_id", "dir"])
            .groupBy(F.col("to_id").alias("id"), F.col("dir"))
            .agg(F.min("label").alias("nbr_min"))
        )
        upd = _truncate_lineage(
            labels.join(nbr_min, ["id", "dir"], "left").select(
                "id",
                "dir",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
                (F.col("nbr_min") < F.col("label")).alias("_chg"),
            ),
            checkpoint,
        )
        labels = upd.drop("_chg")
        frontier = upd.filter(F.col("_chg")).drop("_chg")
        # metadata-sized scalar loop control over the materialized upd
        if frontier.count() == 0:
            converged = True
            break
    if not converged:
        msg = (
            "directed min-reach propagation stopped before its fixpoint "
            f"(max_iterations={max_iterations}); SCC results derived from "
            "it may merge or split components. Raise max_iterations."
        )
        if on_no_convergence == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, UserWarning, stacklevel=3)
    return labels.groupBy("id").agg(
        F.min(F.when(F.col("dir") == 0, F.col("label"))).alias("f_label"),
        F.min(F.when(F.col("dir") == 1, F.col("label"))).alias("b_label"),
    )


def ktruss_edges(
    canonical_edges: DataFrame,
    k: int,
    max_iterations: int = 8,
    checkpoint: str = "auto",
    on_no_convergence: str = "raise",
) -> DataFrame:
    """k-truss decomposition (Cohen 2008) — the EDGE analog of k-core:
    repeatedly delete every edge in fewer than k-2 triangles (all at once
    per round) until fixpoint; the survivors form the k-truss, the
    standard cohesive-subgraph tightening one notch stronger than
    (k-1)-core. Input: canonical (src, dst) edges with src < dst, deduped.
    Output: surviving (src, dst, support) with support = triangles
    through the edge WITHIN the truss (all >= k-2). Like peeling k-core,
    the fixpoint is removal-order-independent — engine-exact despite
    iteration, so a bounded-round unrolled-CTE DuckDB oracle matches
    bit-for-bit (the LPA recipe; converged rounds are no-ops, so an
    oracle unrolled to ``max_iterations`` equals any earlier fixpoint).

    Physical shape per round: support counting is ONE wedge self-join of
    the both-direction adjacency on the common-neighbor key (partial-agg
    count), closed against the canonical edge list — the triangle-count
    plan family; the filter is a broadcast-able semi-join. Per-round
    lineage truncation; the scalar loop control is the surviving-edge
    count (monotone decreasing, so equality with the previous round IS
    the fixpoint).

    ``on_no_convergence``: "raise" (default) or "warn" — a truncated
    peel leaves a SUPERSET of the true k-truss (peeling is monotone).
    """
    if k < 3:
        raise ValueError("k must be >= 3 (2-truss is every edge)")
    min_sup = k - 2
    E = _truncate_lineage(
        canonical_edges.select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
        .distinct(),
        checkpoint,
    )
    prev_n = E.count()

    def _support(edges_df: DataFrame) -> DataFrame:
        adj = edges_df.select(
            F.col("src").alias("u"), F.col("dst").alias("w")
        ).unionByName(
            edges_df.select(F.col("dst").alias("u"), F.col("src").alias("w"))
        )
        p, q = adj.alias("p"), adj.alias("q")
        wedges = p.join(
            q,
            (F.col("p.w") == F.col("q.w")) & (F.col("p.u") < F.col("q.u")),
        ).select(F.col("p.u").alias("src"), F.col("q.u").alias("dst"))
        return (
            wedges.join(edges_df, ["src", "dst"], "left_semi")
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("support"))
        )

    converged = prev_n == 0
    final_sup = None
    for _ in range(max_iterations):
        if converged:
            break
        sup = _support(E)
        E = _truncate_lineage(
            E.join(
                sup.filter(F.col("support") >= min_sup).select("src", "dst"),
                ["src", "dst"],
                "left_semi",
            ),
            checkpoint,
        )
        n = E.count()  # metadata-sized scalar loop control
        if n == prev_n:
            converged = True
            # the round that detected the fixpoint computed support on an
            # edge set identical to the final one — reuse it instead of
            # re-running the wedge join (the query's only superlinear
            # stage) one extra time
            final_sup = sup
        prev_n = n
    if not converged:
        msg = (
            f"k-truss peel stopped before its fixpoint "
            f"(max_iterations={max_iterations}); the result is a SUPERSET "
            "of the true k-truss. Raise max_iterations."
        )
        if on_no_convergence == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, UserWarning, stacklevel=2)
    if final_sup is None:
        final_sup = _support(E)
    return E.join(final_sup, ["src", "dst"], "left").select(
        "src",
        "dst",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 8,
    max_iterations: int = 20,
    checkpoint: str = "auto",
    on_no_convergence: str = "raise",
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph: (id, component)
    with component = min vertex id of the SCC. The iterated
    forward/backward min-reach algorithm (the Spark-shaped form of
    FW-BW/coloring — Orzan 2004's coloring step with the min id as color):

      per round, compute f(v) = min id reachable FROM v and b(v) = min id
      that REACHES v (two CC-style fixpoints on the remaining subgraph).
      f(v) = b(v) = m certifies v and m mutually reachable, so every
      vertex with f = b joins component f(v); assigned vertices and their
      edges drop out and the next round runs on the remainder.

    Correctness: if f(v) = b(v) = m then v reaches m and m reaches v
    (definitions), so v ∈ SCC(m); conversely the round always assigns at
    least SCC(min remaining vertex) — the global min m has f(m) = b(m) = m
    and every w ∈ SCC(m) sees f(w) = b(w) = m — so the loop strictly
    shrinks and terminates in ≤ #SCC rounds (usually 1-2 on real graphs:
    all SCCs whose min id is both min-forward- and min-backward-reach of
    their members assign simultaneously).

    ``on_no_convergence`` defaults to "raise": a truncated inner fixpoint
    could mis-assign components, not just under-assign, so silent
    truncation is never acceptable for SCC.

    Scale shape: each round is ONE ``connected_components``-shaped loop
    carrying both direction labels at once (``_bidirectional_min_reach``:
    broadcast-able label side, partial-agg min, per-superstep lineage
    truncation, exact monotone sum fingerprint for convergence); the
    f = b intersection falls out of the same relation and the remainder
    shrinks monotonically. Not SQL-expressible (nested fixpoints) — the
    registered query takes the driver's rows-only check; exactness is
    property-tested against a reference Tarjan on random digraphs.
    """
    remaining = _truncate_lineage(
        edges.select("src", "dst").distinct(), checkpoint
    )
    verts = remaining.select(F.col("src").alias("id")).union(
        remaining.select(F.col("dst").alias("id"))
    ).distinct()
    # one count decides the broadcast tier for every inner fixpoint (the
    # vertex set only shrinks across rounds, so the decision is stable);
    # the fused loop's label relation carries BOTH directions — 2 rows
    # per vertex — so the cap is halved to preserve the documented
    # broadcast sizing
    broadcast_labels = verts.count() <= BROADCAST_LABELS_MAX // 2
    result: DataFrame | None = None
    for _round in range(max_rounds):
        if not verts.take(1):
            break
        fb = _bidirectional_min_reach(
            remaining, verts, checkpoint, max_iterations,
            on_no_convergence, broadcast_labels,
        )
        assigned = fb.filter(
            F.col("f_label") == F.col("b_label")
        ).select("id", F.col("f_label").alias("component"))
        assigned = _truncate_lineage(assigned, checkpoint)
        result = assigned if result is None else result.unionByName(assigned)
        verts = _truncate_lineage(
            verts.join(assigned, "id", "left_anti"), checkpoint
        )
        if not verts.take(1):
            # the common single-round exit: everything assigned — skip
            # rebuilding (and materializing) the now-empty remainder edge
            # relation, which is pure wasted work on the final round
            break
        remaining = _truncate_lineage(
            remaining.join(
                assigned.select(F.col("id").alias("src")), "src", "left_anti"
            ).join(
                assigned.select(F.col("id").alias("dst")), "dst", "left_anti"
            ),
            checkpoint,
        )
    if verts.take(1):
        raise RuntimeError(
            f"SCC did not assign every vertex within max_rounds={max_rounds};"
            " raise max_rounds (needs at most one round per component in"
            " the worst case)."
        )
    if result is None:  # empty edge set → empty result, not None
        spark = edges.sparkSession
        return spark.createDataFrame([], "id BIGINT, component BIGINT")
    return result


def personalized_pagerank(
    undirected_edges: DataFrame,
    sources: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: str = "auto",
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """Personalized PageRank: random walks restart at the SOURCE set, not
    uniformly — ``pr'(v) = (1-d)·reset(v) + d·Σ_{u→v} pr(u)/outdeg(u)``
    with reset(v) = 1/|S| for v ∈ S else 0 — the similarity measure
    recommenders use for "nodes related to THESE seeds" (topic-sensitive
    PageRank, Haveliwala 2002). ``sources`` is a 1-column (id) DataFrame;
    sources not present in the graph contribute nothing (documented mass
    loss, consistent with restricting the walk to the graph).

    Unlike uniform PageRank, vertices can receive ZERO contribution mass
    (unreachable from S), so each iteration rebuilds from the full vertex
    relation with a left join + coalesce(0) — dropping the no-contribution
    vertices would silently shrink the output. Same 2^-38 contribution
    quantization as ``pagerank`` → the unrolled-CTE DuckDB oracle matches
    bit-for-bit by construction. Same broadcast/lineage physical shape.
    """
    edges = _truncate_lineage(
        undirected_edges.select("src", "dst"), checkpoint
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    verts = edges.select(F.col("src").alias("id")).distinct()
    # distinct BEFORE counting: duplicate seed ids would otherwise both
    # inflate 1/|S| and duplicate the seed's vertex row through the left
    # join, double-counting its outgoing mass every iteration
    src_ids = sources.select(F.col("id")).distinct()
    n_src = src_ids.count()
    if n_src == 0:
        raise ValueError("sources must be non-empty")
    flagged = verts.join(
        F.broadcast(src_ids.withColumn("_s", F.lit(1))),
        "id",
        "left",
    )
    reset = F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_src)).otherwise(
        F.lit(0.0)
    )
    base = _truncate_lineage(
        flagged.select("id", reset.alias("reset")), checkpoint
    )
    ranks = base.select("id", F.col("reset").alias("rank"))
    if broadcast_ranks is None:
        broadcast_ranks = verts.count() <= BROADCAST_LABELS_MAX
    weighted = _truncate_lineage(edges.join(outdeg, "src"), checkpoint)
    grid = float(1 << 38)
    for _ in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = F.col("rank") / F.col("outdeg")
        quant = (
            F.floor(contrib * F.lit(grid) + F.lit(0.5)).cast("double")
            / F.lit(grid)
        )
        sums = (
            weighted.join(r, weighted["src"] == r["id"], "inner")
            .select(F.col("dst").alias("id"), quant.alias("contrib"))
            .groupBy("id")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = _truncate_lineage(
            base.join(sums, "id", "left").select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("reset")
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("rank"),
            ),
            checkpoint,
        )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def adamic_adar(
    undirected_edges: DataFrame,
    top_k: int = 100,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction: for each NON-adjacent vertex pair
    (a < b) with at least one common neighbor, score = Σ_z 1/ln(deg(z))
    over common neighbors z; returns the ``top_k`` pairs as
    (a, b, score, rank), score rounded to 6 dp before ranking and ties
    broken on (a, b) — fully deterministic, value-oracle-checkable
    (common neighbors always have deg ≥ 2, so ln(deg) > 0).

    Cross-engine exactness (since round 6 — the pagerank construction):
    every 1/ln(deg) term is quantized to the 2^-38 binary grid before
    summation, so the per-pair score is an exact, order-independent sum
    of grid multiples (≤ 1.443 each; exact up to 2^15 total) and the
    value hash no longer rests on float accumulation order. The residual
    exposure is only ln() itself landing within 1 ulp of a grid
    boundary — the same measure-zero class personalized_pagerank
    accepts for its division.

    Input: the both-direction undirected edge set (``undirected``'s
    output contract). Scale shape: candidate pairs are wedges generated
    FROM each common neighbor (self-join of the adjacency list on the
    center vertex) — cost Σ_z deg(z)², the same wedge budget as triangle
    counting (measured: the UNBOUNDED sf0.1 co-review near-clique is
    ~4×10⁹ wedges / ~120 s, scaling linearly in wedge count —
    PERFORMANCE.md). Exact by default; ``max_center_degree`` opts into
    the same guard contract as ``triangles_per_vertex``: hubs above the
    cap keep only their ``max_center_degree`` smallest neighbors as wedge
    CENTERS (deterministic), scores become lower bounds, and a warning
    quantifies the clipped-hub count. Degrees in 1/ln(deg) always stay
    exact — the cap bounds wedge generation, not the degree statistic.
    The existing-edge exclusion is one anti-join on the (a, b) pair key,
    and the final top-k is a single TakeOrdered over the scored pairs.
    """
    E = undirected_edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint()
    deg = E.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centered = E.join(deg, "src").select(
        F.col("src").alias("z"), F.col("dst").alias("x"), "deg"
    )
    if max_center_degree is not None:
        clipped = (
            deg.filter(F.col("deg") > max_center_degree).count()
        )
        if clipped:
            warnings.warn(
                f"adamic_adar: {clipped} centers exceed "
                f"max_center_degree={max_center_degree}; clipped neighbor "
                "lists make scores a lower bound. Pass "
                "max_center_degree=None for exact scores (wedge-bound on "
                "near-cliques).",
                UserWarning,
                stacklevel=2,
            )
            wcap = Window.partitionBy("z").orderBy(F.col("x").asc())
            centered = (
                centered.withColumn("_rn", F.row_number().over(wcap))
                .filter(F.col("_rn") <= max_center_degree)
                .drop("_rn")
                .localCheckpoint()
            )
    w1 = centered.select("z", F.col("x").alias("a"), "deg")
    w2 = centered.select("z", F.col("x").alias("b"))
    wedges = w1.join(w2, "z").filter(F.col("a") < F.col("b"))
    existing = E.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    # Each 1/ln(deg) term is quantized to the 2^-38 binary grid and summed
    # as BIGINT grid UNITS (not doubles), so the per-pair sum is exact and
    # order-independent with no magnitude ceiling; the 6-dp rounding is
    # then round-half-up in exact integer arithmetic (decimal widening —
    # units*1e6 can pass 2^63 on near-cliques) and the only float op left
    # is one IEEE division of two identical integers per engine. This
    # removes the round(double, 6) tie-boundary exposure (VERDICT r06
    # item 2); the residual is ln() itself landing within 1 ulp of a grid
    # boundary — the measure-zero class the other quantized operators
    # accept.
    grid = 1 << 38
    term_units = F.floor(
        F.lit(1.0) / F.log("deg") * F.lit(float(grid)) + F.lit(0.5)
    ).cast("long")
    scored = (
        wedges.join(existing, ["a", "b"], "left_anti")
        .groupBy("a", "b")
        .agg(F.sum(term_units).alias("_units"))
        .withColumn(
            "score",
            F.expr(
                "CAST((CAST(_units AS DECIMAL(38,0)) * 1000000 "
                f"+ {grid // 2}) DIV {grid} AS BIGINT)"
            ).cast("double")
            / F.lit(1e6),
        )
        .drop("_units")
    )
    # TakeOrderedAndProject (distributed per-partition heaps) for the
    # top-k; rank is then a window over at most top_k rows — metadata
    # scale, never a whole-data single-partition sort.
    top = scored.orderBy(
        F.col("score").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(top_k)
    w = Window.orderBy(F.col("score").desc(), F.col("a").asc(), F.col("b").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bfs_hops(
    undirected_edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Multi-source BFS: minimum hop count from any ``sources`` row
    (column ``id``) to every vertex reachable within ``max_hops``.
    Output: (id, hops), hops ∈ [0, max_hops] — exact integers, so the
    DuckDB oracle (unrolled frontier CTEs) is bit-for-bit.

    Distributed shape: the classic synchronous frontier expansion — per
    round one equi-join of the CURRENT frontier against the edge list and
    a min-agg; the frontier is the only shuffled relation (never the full
    distance table re-joined), and each round's result is lineage-truncated
    like the other iterative operators. max_hops bounds the rounds, which
    is what a 100 TB caller wants anyway (unbounded BFS on a social-scale
    graph is a connected-components question — use those operators)."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    edges = undirected_edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint()
    dist = sources.select(F.col("id")).distinct().withColumn(
        "hops", F.lit(0).cast("long")
    ).localCheckpoint()
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return dist


def bfs_hops_per_source(
    undirected_edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """PER-SOURCE BFS distances: (source, id, hops) for every (source,
    vertex) pair within ``max_hops`` — the building block for
    sampled-centrality estimation (Eppstein & Wang 2001: closeness from k
    sampled single-source BFS runs instead of all-pairs). Same synchronous
    frontier expansion as ``bfs_hops``, with the source id carried as a
    grouping column, so all k BFS runs advance in ONE job per round — k
    never multiplies the round count, only the frontier width.
    Exact integers → unrolled-CTE value oracle like ``bfs_hops``."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    edges = undirected_edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint()
    dist = (
        sources.select(F.col("id").alias("source"))
        .distinct()
        .select("source", F.col("source").alias("id"))
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(dist.select("source", "id"), ["source", "id"], "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return dist


def betweenness_sampled(
    undirected_edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Sampled betweenness centrality — Brandes' dependency accumulation
    (Brandes 2001) restricted to shortest paths FROM the given source set
    within ``max_hops`` (the standard k-sample estimator shape; exact for
    the sampled sources, like ``bfs_hops_per_source`` is for closeness):

    forward: per-source BFS levels carrying σ(v) = number of shortest
    s→v paths (exact BIGINT sums over predecessor σ); backward:
    δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w)) accumulated level by
    level, and betweenness(v) = Σ_s δ_s(v) for v ≠ s.

    Engine-exact construction: every backward term is quantized to the
    2^-38 binary grid and accumulated as BIGINT units (the adamic_adar /
    pagerank recipe), so sums are order-independent and the one float
    expression per term — σv/σw · (1 + δw/2^38) · 2^38, identically
    parenthesized in the SQL oracle — is deterministic; the output double
    units/2^38 is exactly representable. Overflow headroom: units stay
    < 2^63 while Σδ < 2^25 (≈33M path dependencies), far above the
    bounded-source contract's reach.

    Output: (id, betweenness) for every non-source vertex reached within
    ``max_hops`` (horizon-edge vertices carry exact 0).

    Scale shape: all sources advance in ONE job per level (source is a
    grouping column); each level is an equi-join + partial-agg over the
    edge list; the backward pass is one join per level over the
    (source, vertex) level relations. Unrolled-CTE value oracle.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    grid = 1 << 38
    edges = undirected_edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint()
    lvl0 = (
        sources.select(F.col("id")).distinct()
        .select(F.col("id").alias("source"), F.col("id"))
        .withColumn("sigma", F.lit(1).cast("long"))
        .localCheckpoint()
    )
    levels = [lvl0]
    visited = lvl0.select("source", "id")
    for _h in range(1, max_hops + 1):
        nxt = (
            levels[-1]
            .join(edges, levels[-1]["id"] == edges["src"])
            .select("source", F.col("dst").alias("id"), "sigma")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["source", "id"], "left_anti")
            .localCheckpoint()
        )
        levels.append(nxt)
        visited = visited.unionByName(
            nxt.select("source", "id")
        ).localCheckpoint()
    # backward dependency accumulation, deepest level first (δ = 0 there)
    delta = levels[max_hops].select(
        "source", "id", F.lit(0).cast("long").alias("units")
    )
    out_parts = [delta]
    term = F.expr(
        "CAST(floor((CAST(sigma AS DOUBLE) / CAST(w_sigma AS DOUBLE))"
        f" * (CAST(1 AS DOUBLE) + CAST(w_units AS DOUBLE) / {grid})"
        f" * {grid} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    for lv in range(max_hops - 1, 0, -1):
        succ = levels[lv + 1].join(delta, ["source", "id"]).select(
            "source",
            F.col("id").alias("w_id"),
            F.col("sigma").alias("w_sigma"),
            F.col("units").alias("w_units"),
        )
        pairs = (
            levels[lv]
            .join(edges, levels[lv]["id"] == edges["src"])
            .select("source", "id", "sigma", F.col("dst").alias("w_id"))
            .join(succ, ["source", "w_id"])
        )
        summed = pairs.select(
            "source", "id", term.alias("t")
        ).groupBy("source", "id").agg(F.sum("t").alias("units"))
        delta = (
            levels[lv]
            .join(summed, ["source", "id"], "left")
            .select(
                "source",
                "id",
                F.coalesce("units", F.lit(0)).cast("long").alias("units"),
            )
            .localCheckpoint()
        )
        out_parts.append(delta)
    acc = out_parts[0]
    for p in out_parts[1:]:
        acc = acc.unionByName(p)
    return acc.groupBy("id").agg(
        (F.sum("units").cast("double") / F.lit(float(grid))).alias(
            "betweenness"
        )
    )


def hits_scores(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) on a directed edge list,
    UNNORMALIZED: h_0 = 1 for every vertex, then per iteration
    ``a_t(v) = Σ_{u→v} h_{t-1}(u)`` and ``h_t(v) = Σ_{v→u} a_t(u)``.
    Skipping the per-step norm keeps every score an exact BIGINT (the ranking
    is identical — normalization is a positive scalar), so the whole
    computation is value-checkable by an unrolled-CTE SQL oracle; a
    normalized double is emitted once at the end (authority / max authority,
    rounded 6 dp; NULL on an empty edge set).

    Returns (id, authority, hub, authority_norm) for every vertex.

    Scale design (100 TB): each half-step is one equi-join of the edge list
    against the (id, score) relation plus a partial-agg shuffle — the edge
    list is never self-joined; per-iteration ``localCheckpoint`` truncates
    lineage (the pagerank/LPA pattern). Overflow headroom: scores grow by a
    factor ≤ max degree per half-step, so 2 iterations stay far inside
    BIGINT for any realistic graph (deg 10^4 → ~10^16).

    Reference anchor: Recommendations.java:68-77 ranks users/products by
    community expansion; HITS is the canonical link-analysis twin on the
    same directed co-review structure.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select("src", "dst").distinct().localCheckpoint()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    hub = verts.withColumn("h", F.lit(1).cast("long"))
    auth = None
    for _ in range(iterations):
        a_in = (
            e.join(hub.select(F.col("id").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("a"))
        )
        auth = (
            verts.join(a_in, "id", "left")
            .withColumn("a", F.coalesce("a", F.lit(0)).cast("long"))
            .localCheckpoint()
        )
        h_out = (
            e.join(auth.select(F.col("id").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("h"))
        )
        hub = (
            verts.join(h_out, "id", "left")
            .withColumn("h", F.coalesce("h", F.lit(0)).cast("long"))
            .localCheckpoint()
        )
    max_a = auth.agg(F.max("a").alias("_max_a"))
    return (
        auth.join(hub, "id")
        .crossJoin(F.broadcast(max_a))
        .select(
            "id",
            F.col("a").alias("authority"),
            F.col("h").alias("hub"),
            F.when(F.col("_max_a") > 0,
                   F.round(F.col("a").cast("double")
                           / F.col("_max_a").cast("double"), 6))
            .alias("authority_norm"),
        )
    )


def deterministic_random_walks(
    undirected_edges: DataFrame,
    sources: DataFrame,
    n_walks: int = 2,
    steps: int = 3,
) -> DataFrame:
    """Random-walk corpus generation (the DeepWalk/node2vec data-prep
    stage, Perozzi et al. 2014) with DETERMINISTIC pseudo-randomness: from
    each source vertex, ``n_walks`` walks of ``steps`` hops where the next
    hop from vertex v in walk w at step k is
    ``argmin_{u ∈ N(v)} md5(w|k|v|u)`` — the portable-hash analogue of a
    uniform neighbor draw, reproducible across runs, engines and
    partitionings (the property a training corpus needs) and therefore
    value-checkable by an unrolled-CTE SQL oracle.

    Returns (source, walk_no, step, vertex) — step 0 is the source itself.
    Walks stop early at a dead-end vertex (no out-edges in the relation).

    Scale design (100 TB): per step ONE frontier⨝edges equi-join and a
    min(struct) partial-agg argmin (never a window over the fan-out);
    lineage truncated per step. All walks advance in the same job — walk
    count multiplies frontier width, never round count.
    """
    if n_walks < 1 or steps < 0:
        raise ValueError("n_walks >= 1 and steps >= 0 required")
    from .dedup import portable_hash32

    edges = (
        undirected_edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    spark = undirected_edges.sparkSession
    wdf = spark.range(n_walks).select(F.col("id").alias("walk_no"))
    cur = (
        sources.select(F.col("id").alias("source"))
        .distinct()
        .crossJoin(F.broadcast(wdf))
        .withColumn("step", F.lit(0).cast("long"))
        .withColumn("vertex", F.col("source"))
    )
    out = cur
    for k in range(1, steps + 1):
        h = portable_hash32(
            F.concat_ws(
                "|",
                F.col("walk_no"),
                F.lit(k),
                F.col("vertex"),
                F.col("dst"),
            )
        )
        nxt = (
            cur.join(edges, cur["vertex"] == edges["src"])
            .withColumn("_h", h)
            .groupBy("source", "walk_no")
            .agg(F.min(F.struct(F.col("_h"), F.col("dst"))).alias("_m"))
            .select(
                "source",
                "walk_no",
                F.lit(k).cast("long").alias("step"),
                F.col("_m.dst").alias("vertex"),
            )
            .localCheckpoint()
        )
        out = out.unionByName(nxt)
        cur = nxt
    return out
