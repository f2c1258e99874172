"""Event-sequence analytics operators: funnel analysis and cohort
retention — the two classic product-analytics shapes over an event stream
that the windowed suite (tumble/slide/session) doesn't cover.

Both are exact integer/timestamp logic end-to-end, so they carry full
DuckDB value oracles. Timestamps follow the engine-wide epoch-nanos
LongType contract (sources.tables normalizes the testdata encoding);
all bucket arithmetic is integer division — no float time math.

Scale shape: funnels are K chained (filter → per-user min) aggregations,
each partial-aggregated and keyed on user_id — every stage join is a
shuffle equi-join on the same key, so one exchange distribution is reused
across stages (AQE keeps them co-partitioned). Cohort retention is two
aggregations over (user, week) plus one broadcast-size join of per-user
cohorts back onto per-user-week activity. Nothing is quadratic; no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANOS_PER_SEC = 1_000_000_000
WEEK_SEC = 7 * 86400


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    max_span_sec: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the first time they
    completed step 1, the first step-2 event strictly AFTER that, the
    first step-3 event strictly after THAT, and so on — the standard
    product funnel (each stage must follow the previous one in event
    time; re-orderings don't count). Output: one row per user who reached
    step 1, with ``<step>_ts`` epoch-second columns (null once the funnel
    breaks) and ``stage`` = number of steps completed.

    ``max_span_sec`` additionally requires the WHOLE funnel to complete
    within that many seconds of the step-1 event (conversion windows like
    "purchase within 7 days of first view").

    The chained-min formulation keeps every stage a partial-aggregated
    (filter → groupBy(user).min) pass joined on user_id — no window sort
    over the full event stream, no per-user event-list materialization.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    sec = F.expr(f"CAST(ts DIV {NANOS_PER_SEC} AS BIGINT)")
    ev = events.select(
        "user_id", F.col("event_type"), sec.alias("sec")
    )
    out: DataFrame | None = None
    prev_col: str | None = None
    for step in steps:
        col = f"{step}_ts"
        stage_events = ev.filter(F.col("event_type") == step)
        if out is None:
            out = stage_events.groupBy("user_id").agg(
                F.min("sec").alias(col)
            )
        else:
            nxt = (
                stage_events.join(
                    out.select("user_id", prev_col), "user_id"
                )
                .filter(F.col("sec") > F.col(prev_col))
                .groupBy("user_id")
                .agg(F.min("sec").alias(col))
            )
            out = out.join(nxt, "user_id", "left")
        prev_col = col
    first = f"{steps[0]}_ts"
    if max_span_sec is not None:
        for step in steps[1:]:
            col = f"{step}_ts"
            out = out.withColumn(
                col,
                F.when(
                    F.col(col) <= F.col(first) + max_span_sec, F.col(col)
                ),
            )
        # a stage nulled by the span cap breaks every later stage too
        for i, step in enumerate(steps[2:], start=2):
            col, prev = f"{step}_ts", f"{steps[i - 1]}_ts"
            out = out.withColumn(
                col, F.when(F.col(prev).isNotNull(), F.col(col))
            )
    stage = sum(
        F.when(F.col(f"{s}_ts").isNotNull(), 1).otherwise(0) for s in steps
    )
    return out.withColumn("stage", stage.cast("int"))


def retention_cohorts(
    events: DataFrame, bucket_sec: int = WEEK_SEC
) -> DataFrame:
    """Cohort retention: bucket users by the period of their FIRST event
    (the cohort), then count how many of each cohort were active in each
    subsequent period. ``bucket_sec`` picks the grain (WEEK_SEC default;
    86400 for daily cohorts on short event histories). Output:
    (cohort_start, period_offset, n_users) with periods as epoch-second
    bucket starts and offset 0 = the cohort period itself (so offset-0
    rows give cohort sizes).

    Two partial-aggregated passes: distinct (user, period) activity, and
    per-user min period; the per-user cohort relation joins back on
    user_id. Integer bucket arithmetic keeps the oracle bit-equal.
    """
    sec = F.expr(f"CAST(ts DIV {NANOS_PER_SEC} AS BIGINT)")
    period = sec - sec % bucket_sec
    activity = (
        events.select("user_id", period.alias("period"))
        .distinct()
    )
    cohorts = activity.groupBy("user_id").agg(
        F.min("period").alias("cohort_start")
    )
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_start",
            ((F.col("period") - F.col("cohort_start")) / bucket_sec)
            .cast("bigint")
            .alias("period_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def activity_similarity_topk(
    events: DataFrame,
    bucket_sec: int = 3600,
    k: int = 3,
) -> DataFrame:
    """Time-series similarity search over per-user activity series (the
    EDBT'19 distributed time-series-similarity shape): each user's series
    is their event count per time bucket, and the k most similar other
    users are ranked by squared Euclidean distance between the series —
    computed WITHOUT ever materializing dense vectors:

        dist²(u, v) = Σ_b (c_u(b) − c_v(b))²
                    = ‖c_u‖² + ‖c_v‖² − 2·Σ_b c_u(b)·c_v(b)

    The cross term is a SPARSE self-join on the bucket key (only buckets
    where both users were active produce rows), the norms are one
    partial-agg pass, and pairs with no shared bucket fall back to
    ‖c_u‖² + ‖c_v‖² via a left join — so the plan is equi-join + window,
    never a dense cross product over the series length. All counts are
    integers → exact arithmetic end-to-end (full value oracle).

    The all-pairs norm cross join is the exact baseline tier, bounded by
    the caller's user filter (same stance as `triangle_counts` /
    `ngram_jaccard_pairs`); at full population the same per-(user, bucket)
    count relation feeds the SRP/IVF ANN operators instead.

    Output: (user_id, neighbor_id, dist2, rank), rank 1..k by
    (dist2 ASC, neighbor_id ASC).
    """
    from pyspark.sql import Window

    counts = (
        events.select(
            "user_id",
            F.expr(f"CAST(ts DIV {NANOS_PER_SEC} AS BIGINT)").alias("s"),
        )
        .select("user_id", (F.col("s") - F.pmod("s", F.lit(bucket_sec)))
                .alias("bucket"))
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    norms = counts.groupBy("user_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("n2")
    )
    a, b = counts.alias("a"), counts.alias("b")
    dots = (
        a.join(b, "bucket")
        .filter(F.col("a.user_id") != F.col("b.user_id"))
        .groupBy(
            F.col("a.user_id").alias("user_id"),
            F.col("b.user_id").alias("neighbor_id"),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"))
    )
    na = norms.select(F.col("user_id"), F.col("n2").alias("na2"))
    nb = norms.select(
        F.col("user_id").alias("neighbor_id"), F.col("n2").alias("nb2")
    )
    pairs = (
        na.crossJoin(nb)
        .filter(F.col("user_id") != F.col("neighbor_id"))
        .join(dots, ["user_id", "neighbor_id"], "left")
        .select(
            "user_id",
            "neighbor_id",
            (
                F.col("na2") + F.col("nb2")
                - 2 * F.coalesce(F.col("dot"), F.lit(0))
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def gap_fill_locf(
    events: DataFrame, width_sec: int = 3600, max_buckets: int = 8784
) -> DataFrame:
    """Time-series gap filling over a dense bucket spine with
    last-observation-carried-forward (the TimescaleDB
    ``time_bucket_gapfill`` + ``locf`` shape): bucket the stream per
    event_type, then LEFT-join those aggregates onto the complete
    [min, max] bucket grid so silent periods appear as explicit rows —
    ``n_events = 0``, ``is_gap = 1``, and ``filled_avg`` carrying the
    last observed bucket average forward (NULL before the first
    observation, same in both engines).

    Scale shape: the heavy work is one partial-agg shuffle of the raw
    stream on (event_type, bucket); the spine is O(types × buckets) —
    a function of the TIME RANGE, not event volume, so at 100 TB it is
    still thousands of rows. The LOCF window partitions by event_type
    over that bounded spine, never over raw events, and the bounds row
    broadcasts. Exact-integer bucket arithmetic (epoch-nanos DIV);
    bucket averages round to 6 dp before the carry-forward copies them.

    ``max_buckets`` bounds the spine to the most recent N buckets (round
    15): even inside the valid-time domain, ONE stray in-window outlier
    stretched a [min, max] spine to 24 years × |types| ≈ 6M rows (driver
    OOM collecting what should be a dashboard-sized series). Gap-filling
    the recent window is the operational semantics anyway; the default
    (a leap year of hourly buckets) is far above the generator's ~720.
    """
    from pyspark.sql import Window

    sec = F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    bucket = (sec - sec % width_sec).alias("bucket_sec")
    per_bucket = (
        events.select("event_type", bucket, "value")
        .groupBy("event_type", "bucket_sec")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.avg("value"), 6).alias("bucket_avg"),
        )
    )
    bounds = per_bucket.agg(
        F.min("bucket_sec").alias("mn"), F.max("bucket_sec").alias("mx")
    ).select(
        F.greatest(
            F.col("mn"),
            F.col("mx") - F.lit((max_buckets - 1) * width_sec).cast("long"),
        ).alias("mn"),
        "mx",
    )
    spine = (
        events.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.col("mn"), F.col("mx"), F.lit(width_sec).cast("long")
                )
            ).alias("bucket_sec"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(per_bucket, ["event_type", "bucket_sec"], "left")
        .select(
            "event_type",
            "bucket_sec",
            F.coalesce("n_obs", F.lit(0)).alias("n_events"),
            F.when(F.col("n_obs").isNull(), 1).otherwise(0).alias("is_gap"),
            F.last("bucket_avg", ignorenulls=True).over(w).alias(
                "filled_avg"
            ),
        )
    )
