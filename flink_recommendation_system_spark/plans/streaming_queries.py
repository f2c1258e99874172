"""Windowed / event-time query suite over the `events` stream table.

These are the streaming-native extensions (SURVEY.md §2.8 notes the
reference has none): tumbling-window stats and gap-based session windows,
defined once in ``streaming.windows`` and validated here in batch mode
against integer-arithmetic DuckDB oracles. The same functions run under
``readStream`` + watermark (tests/test_streaming_windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators._util import VALID_TS_SQL, valid_ts
from ..sources.tables import load_table, load_table_clean
from ..streaming.windows import (
    session_window_stats,
    sliding_window_stats,
    tumbling_window_stats,
    windowed_review_counts,
)

TUMBLE_SEC = 3600
SLIDE_WIDTH_SEC = 7200
SLIDE_SEC = 3600
SESSION_GAP_SEC = 1800


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_stats(
        load_table_clean(spark, sf_dir, "events").filter(valid_ts("ts")), width_sec=TUMBLE_SEC
    )


EVENT_WINDOWS_SQL = f"""
WITH e AS (
    SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s, event_type, value
    FROM events
)
SELECT (s // {TUMBLE_SEC}) * {TUMBLE_SEC} AS win_start_sec,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS value_sum
FROM e
GROUP BY 1, 2
"""


def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_stats(
        load_table(spark, sf_dir, "events").filter(valid_ts("ts")),
        width_sec=SLIDE_WIDTH_SEC,
        slide_sec=SLIDE_SEC,
    )


# Each event at second s falls into width/slide = 2 windows whose starts
# are the slide-grid points in (s - width, s]: floor(s/slide)*slide and
# that minus slide.
SLIDING_WINDOWS_SQL = f"""
WITH e AS (
    SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s, event_type
    FROM events
),
expanded AS (
    SELECT unnest([ (s // {SLIDE_SEC}) * {SLIDE_SEC},
                    (s // {SLIDE_SEC}) * {SLIDE_SEC} - {SLIDE_SEC} ])
               AS win_start_sec,
           event_type
    FROM e
)
SELECT win_start_sec, event_type, count(*) AS n_events
FROM expanded
GROUP BY win_start_sec, event_type
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_stats(
        load_table(spark, sf_dir, "events").filter(valid_ts("ts")), gap_sec=SESSION_GAP_SEC
    )


# Gap-based sessionization as an islands-and-gaps window query. Spark's
# session_window merges [t1, t1+gap) with [t2, t2+gap) iff t2 < t1+gap, so a
# NEW session starts exactly when the gap is >= SESSION_GAP_SEC.
USER_SESSIONS_SQL = f"""
WITH e AS (
    SELECT user_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
),
m AS (
    SELECT user_id, s,
           CASE WHEN lag(s) OVER w IS NULL
                     OR s - lag(s) OVER w >= {SESSION_GAP_SEC}
                THEN 1 ELSE 0 END AS new_sess
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY s)
),
g AS (
    SELECT user_id, s,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY s
                               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM m
)
SELECT min(s) AS session_start_sec, user_id, count(*) AS n_events
FROM g GROUP BY user_id, sess_id
"""


def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event annotated with the user's most recent
    prior (ts <=) purchase value. Spark has no built-in as-of join — this is
    the union+window composition (operators/asof.py); the oracle is
    DuckDB's native ASOF LEFT JOIN, pinning the semantics independently."""
    from pyspark.sql import functions as F

    from ..operators.asof import asof_join

    # NULL user keys excluded (round 15): Spark's window-composition
    # as-of join PARTITIONS BY user_id, which groups NULLs together and
    # would match a NULL-user click to a NULL-user purchase, while SQL
    # ASOF JOIN equality never matches NULL = NULL
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(valid_ts("ts") & F.col("user_id").isNotNull())
        .withColumn("s", F.expr("CAST(ts DIV 1000000000 AS BIGINT)"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "s"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "s")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    return asof_join(
        clicks, purchases, key="user_id", left_ts="s", right_ts="s",
        value_cols=["value"],
    )


ASOF_CLICK_PURCHASE_SQL = """
WITH ev AS (
    SELECT event_id, user_id, event_type, value,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
    WHERE user_id IS NOT NULL
),
clicks AS (SELECT event_id, user_id, s FROM ev WHERE event_type = 'click'),
purch AS (
    SELECT user_id, s, arg_max(value, event_id) AS value
    FROM ev WHERE event_type = 'purchase'
    GROUP BY user_id, s
)
SELECT c.user_id, c.event_id, c.s,
       p.value AS value_asof, p.s AS s_asof
FROM clicks c
ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.s >= p.s
"""


def q_events_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: pairs of events by the same user within one hour of
    each other (bucketed equi-join, operators/rangejoin.py). Oracle is the
    plain inequality join — exact at oracle scale."""
    from pyspark.sql import functions as F

    from ..operators.rangejoin import bounded_diff_self_join

    # distinct on the projected key tuple (round 15): a physically
    # duplicated event row must not double its pairs — event_id is the
    # fact's key, so copies are the same event; both engines dedup the
    # same projection so the pair multiset stays identical
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(valid_ts("ts"))
        .select(
            "event_id",
            "user_id",
            F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
        )
        .distinct()
    )
    return bounded_diff_self_join(
        ev, key="user_id", ts_col="s", id_col="event_id", delta=3600
    )


EVENTS_WITHIN_HOUR_SQL = """
WITH e AS (
    SELECT DISTINCT event_id, user_id,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
)
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       a.s AS a_ts, b.s AS b_ts
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(a.s - b.s) <= 3600
"""


def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: the daily aggregate is computed
    FROM the hourly aggregate (sums of sums, counts of counts), not from
    raw events — the continuous-aggregate pattern where each resolution
    feeds the next, so the raw table is scanned once no matter how many
    resolutions exist. Exact-integer bucket arithmetic keeps the oracle
    bit-equal."""
    from pyspark.sql import functions as F

    hourly = tumbling_window_stats(
        load_table_clean(spark, sf_dir, "events").filter(valid_ts("ts")), width_sec=TUMBLE_SEC
    )
    day = (F.col("win_start_sec") - F.col("win_start_sec") % 86400).alias(
        "day_start_sec"
    )
    # sums-of-sums stay on the integer cents grid: each hourly value_sum
    # is exactly a cents multiple, so round(x*100) recovers the integer
    # and the daily sum is order-independent (round-13 review)
    cents = F.round(F.col("value_sum") * 100).cast("long")
    return (
        hourly.groupBy(day, "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(
                F.sum(cents).cast("double") / 100.0, 2
            ).alias("value_sum"),
        )
    )


DAILY_ROLLUP_SQL = f"""
WITH e AS (
    SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s, event_type, value
    FROM events
),
hourly AS (
    SELECT (s // {TUMBLE_SEC}) * {TUMBLE_SEC} AS win_start_sec,
           event_type,
           count(*) AS n_events,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS value_sum
    FROM e GROUP BY 1, 2
)
SELECT win_start_sec - win_start_sec % 86400 AS day_start_sec,
       event_type,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(round(value_sum * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS value_sum
FROM hourly
GROUP BY 1, 2
"""


def q_gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type (operators.events
    gap_fill_locf — the TimescaleDB time_bucket_gapfill + locf shape):
    silent hours become explicit rows with n_events=0, is_gap=1 and the
    last observed hourly average carried forward. The spine is bounded
    by the time range (720 h x 5 types here), not event volume — and by
    the explicit valid-time domain (operators._util.valid_ts, round-15
    adversarial finding: one skewed clock otherwise multiplies the spine
    by millions of buckets PER TYPE)."""
    from ..operators._util import valid_ts
    from ..operators.events import gap_fill_locf

    return gap_fill_locf(
        load_table(spark, sf_dir, "events").filter(valid_ts("ts")),
        TUMBLE_SEC,
    )


GAP_FILLED_HOURLY_SQL = f"""
WITH e AS (
    SELECT event_type,
           (CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // {TUMBLE_SEC})
               * {TUMBLE_SEC} AS bucket_sec,
           value
    FROM events WHERE {VALID_TS_SQL}
),
hourly AS (
    SELECT event_type, bucket_sec, count(*) AS n,
           -- + 0 folds IEEE -0.0 to +0.0 (Spark's round normalizes)
           round(avg(value), 6) + 0 AS bucket_avg
    FROM e GROUP BY 1, 2
),
b AS (SELECT greatest(min(bucket_sec),
                      max(bucket_sec) - 31618800) AS mn,
             max(bucket_sec) AS mx FROM hourly),
spine AS (
    SELECT t.event_type, g.bucket_sec
    FROM (SELECT DISTINCT event_type FROM events
          WHERE {VALID_TS_SQL}) t,
         (SELECT unnest(generate_series(mn, mx, {TUMBLE_SEC}))
              AS bucket_sec FROM b) g
)
SELECT s.event_type, s.bucket_sec,
       coalesce(h.n, 0) AS n_events,
       CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS is_gap,
       last_value(h.bucket_avg IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.bucket_sec
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
FROM spine s
LEFT JOIN hourly h
       ON s.event_type = h.event_type AND s.bucket_sec = h.bucket_sec
"""


FUNNEL_STEPS = ["view", "click", "purchase"]
RETENTION_BUCKET_SEC = 86400  # daily cohorts — the events table spans ~30d


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel (operators.events funnel_stages):
    chained per-user first-occurrence times, each stage strictly after the
    previous — exact timestamp logic, full value oracle."""
    from ..operators.events import funnel_stages

    return funnel_stages(
        load_table(spark, sf_dir, "events"), FUNNEL_STEPS
    )


FUNNEL_STAGES_SQL = """
WITH e AS (
    SELECT user_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec
    FROM events
),
s1 AS (SELECT user_id, min(sec) AS view_ts
       FROM e WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(sec) AS click_ts
       FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND sec > view_ts GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(sec) AS purchase_ts
       FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND sec > click_ts GROUP BY e.user_id)
SELECT s1.user_id, view_ts, click_ts, purchase_ts,
       CAST(1 + CASE WHEN click_ts IS NULL THEN 0 ELSE 1 END
              + CASE WHEN purchase_ts IS NULL THEN 0 ELSE 1 END
            AS INTEGER) AS stage
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention (operators.events retention_cohorts):
    users bucketed by first-event day, activity counted per day offset —
    integer bucket arithmetic, full value oracle."""
    from ..operators.events import retention_cohorts

    return retention_cohorts(
        load_table(spark, sf_dir, "events"), bucket_sec=RETENTION_BUCKET_SEC
    )


RETENTION_COHORTS_SQL = f"""
WITH e AS (
    SELECT user_id,
           (CAST(epoch_ns(ts) // 1000000000 AS BIGINT)
            // {RETENTION_BUCKET_SEC}) * {RETENTION_BUCKET_SEC} AS period
    FROM events
),
a AS (SELECT DISTINCT user_id, period FROM e),
c AS (SELECT user_id, min(period) AS cohort_start FROM a GROUP BY user_id)
SELECT cohort_start,
       (period - cohort_start) // {RETENTION_BUCKET_SEC} AS period_offset,
       count(DISTINCT user_id) AS n_users
FROM a JOIN c USING (user_id)
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "funnel_stages": (q_funnel_stages, FUNNEL_STAGES_SQL),
    "retention_cohorts": (q_retention_cohorts, RETENTION_COHORTS_SQL),
    "asof_click_purchase": (q_asof_click_purchase, ASOF_CLICK_PURCHASE_SQL),
    "events_within_hour": (q_events_within_hour, EVENTS_WITHIN_HOUR_SQL),
    "daily_rollup": (q_daily_rollup, DAILY_ROLLUP_SQL),
    "gap_filled_hourly": (q_gap_filled_hourly, GAP_FILLED_HOURLY_SQL),
    "event_windows": (q_event_windows, EVENT_WINDOWS_SQL),
    "sliding_windows": (q_sliding_windows, SLIDING_WINDOWS_SQL),
    "user_sessions": (q_user_sessions, USER_SESSIONS_SQL),
}


# interval-overlap join demo bounds: users [0, OVERLAP_USER_CUTOFF) keep the
# session-pair count discriminating without exploding at bench SF (the same
# input-bounding stance as triangle_counts on the near-clique graph)
OVERLAP_USER_CUTOFF = 40
OVERLAP_GRID_SEC = 3600


def q_session_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user concurrent-session pairs via the INTERVAL-OVERLAP join
    (operators.rangejoin.interval_overlap_join) — the third time-series
    join Spark lacks natively (with as-of and bounded-diff). Sessions are
    the same gap-1800s windows as `user_sessions` with their gap-padded
    ends; a pair counts when the closed intervals intersect. Grid-cell
    blocking + emit-once keeps it hash-join shaped (no theta-join, no
    distinct). Output: (a_user, b_user, n_overlaps), a_user < b_user.
    Fully value-checked (oracle: islands-and-gaps sessions + plain
    inequality join)."""
    from pyspark.sql import functions as F

    from ..operators.rangejoin import interval_overlap_join
    from ..streaming.windows import events_with_event_time

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < OVERLAP_USER_CUTOFF
    )
    e = events_with_event_time(ev)
    win = F.session_window("event_time", f"{SESSION_GAP_SEC} seconds")
    sess = (
        e.groupBy(win, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("start_sec"),
            F.unix_timestamp(F.col("session_window.end")).alias("end_sec"),
        )
    )
    pairs = interval_overlap_join(
        sess,
        sess,
        grid=OVERLAP_GRID_SEC,
        start_col="start_sec",
        end_col="end_sec",
    )
    return (
        pairs.filter(F.col("a_user_id") < F.col("b_user_id"))
        .groupBy(F.col("a_user_id").alias("a_user"), F.col("b_user_id").alias("b_user"))
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )


SESSION_OVERLAPS_SQL = f"""
WITH e AS (
    SELECT user_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events WHERE user_id < {OVERLAP_USER_CUTOFF}
),
m AS (
    SELECT user_id, s,
           CASE WHEN lag(s) OVER w IS NULL
                     OR s - lag(s) OVER w >= {SESSION_GAP_SEC}
                THEN 1 ELSE 0 END AS new_sess
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY s)
),
g AS (
    SELECT user_id, s,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY s
                               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM m
),
sess AS (
    SELECT user_id, min(s) AS start_sec, max(s) + {SESSION_GAP_SEC} AS end_sec
    FROM g GROUP BY user_id, sess_id
)
SELECT a.user_id AS a_user, b.user_id AS b_user, count(*) AS n_overlaps
FROM sess a JOIN sess b
  ON a.start_sec <= b.end_sec AND b.start_sec <= a.end_sec
 AND a.user_id < b.user_id
GROUP BY a_user, b_user
"""

QUERIES["session_overlaps"] = (q_session_overlaps, SESSION_OVERLAPS_SQL)


SIM_USER_CUTOFF, SIM_BUCKET_SEC, SIM_K = 60, 3600, 3


def q_activity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (operators.events
    activity_similarity_topk): each user's hourly activity series vs every
    other's, k=3 nearest by squared Euclidean distance — computed as
    norms + a SPARSE bucket self-join (never dense vectors). Exact
    integer arithmetic → full value oracle. Users bounded (< 60) for the
    all-pairs exact tier; the unbounded population runs the SRP/IVF ANN
    operators over the same per-(user, bucket) relation."""
    from pyspark.sql import functions as F

    from ..operators.events import activity_similarity_topk

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < SIM_USER_CUTOFF
    )
    return activity_similarity_topk(ev, SIM_BUCKET_SEC, SIM_K)


ACTIVITY_SIMILARITY_SQL = f"""
WITH e AS (
    SELECT user_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events WHERE user_id < {SIM_USER_CUTOFF}
),
c AS (
    -- positive modulo mirrors Spark's pmod: pre-epoch seconds bucket by
    -- FLOOR, not truncation (round 15)
    SELECT user_id,
           s - ((s % {SIM_BUCKET_SEC} + {SIM_BUCKET_SEC})
                % {SIM_BUCKET_SEC}) AS bucket,
           count(*) AS c
    FROM e GROUP BY user_id, bucket
),
n AS (SELECT user_id, CAST(sum(c * c) AS BIGINT) AS n2 FROM c GROUP BY user_id),
d AS (
    SELECT a.user_id AS user_id, b.user_id AS neighbor_id,
           CAST(sum(a.c * b.c) AS BIGINT) AS dot
    FROM c a JOIN c b ON a.bucket = b.bucket AND a.user_id != b.user_id
    GROUP BY 1, 2
),
p AS (
    SELECT na.user_id, nb.user_id AS neighbor_id,
           na.n2 + nb.n2 - 2 * coalesce(d.dot, 0) AS dist2
    FROM n na CROSS JOIN n nb
    LEFT JOIN d ON d.user_id = na.user_id AND d.neighbor_id = nb.user_id
    WHERE na.user_id != nb.user_id
)
SELECT user_id, neighbor_id, dist2, rank FROM (
    SELECT p.*, row_number() OVER (
        PARTITION BY user_id ORDER BY dist2 ASC, neighbor_id ASC
    ) AS rank
    FROM p
) WHERE rank <= {SIM_K}
"""

QUERIES["activity_similarity"] = (q_activity_similarity, ACTIVITY_SIMILARITY_SQL)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-flow transition matrix (the product-analytics
    "Markov chain" shape): consecutive event pairs per user (ordered by
    ts with event_id tie-break — a total order, so the lag is
    deterministic), aggregated to counts and transition probabilities
    per source state. Scale shape: one shuffle on user_id for the lag
    window (per-user partitions are session-sized), then a partial-agg
    shuffle on the tiny (from, to) domain; probability is an exact
    IEEE division of two BIGINTs, identical in both engines."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").filter(valid_ts("ts"))
    # event_type joins the sort key (round 15): duplicated fact rows can
    # share (ts, event_id), and an engine-arbitrary tie order there flips
    # which transition pair the lag emits; type completes the total order
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "event_type")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_from)).alias(
            "prob"
        ),
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT user_id,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts NULLS FIRST,
                                          event_id NULLS FIRST,
                                          event_type NULLS FIRST)
               AS from_type,
           event_type AS to_type
    FROM events
),
pairs AS (
    SELECT from_type, to_type, count(*) AS n
    FROM seq WHERE from_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS prob
FROM pairs
"""


QUERIES["event_transitions"] = (q_event_transitions, EVENT_TRANSITIONS_SQL)


# --- A/B experiment analysis (round 6b) --------------------------------------

AB_SALT = "|ab-exp-1"


def q_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — the product-analytics significance shape:
    users are deterministically bucketed into control/treatment by the
    portable md5 hash of their id (reproducible across runs, engines and
    partitionings — the property a real experiment assignment needs), the
    conversion metric is "more purchase events than view events" (any-
    purchase saturates to 1.0 on this generator — every user buys
    eventually; the ratio metric genuinely splits the population at every
    SF), and the report is ONE row with per-arm counts, rates,
    absolute/relative lift and the two-proportion z-statistic.

    Cross-engine exactness: every count is an integer aggregate; every
    double (rates, pooled rate, standard error, z) is a FIXED expression
    tree over those integers — IEEE +,-,*,/,sqrt are correctly rounded, so
    identical inputs give bit-identical results with NO order-dependent
    double summation anywhere; 6-dp rounding at the end is then identical
    too.

    Scale design (100 TB): one scan → per-user partial agg (any purchase),
    hash assignment is a codegen'd projection, the final reduction is a
    single row."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)),
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    assigned = per_user.withColumn(
        "variant",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(AB_SALT))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2,
    )
    agg = assigned.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1)
              .otherwise(0)).alias("conv_control"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_treatment"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1)
              .otherwise(0)).alias("conv_treatment"),
    )
    na = F.col("n_control").cast("double")
    nb = F.col("n_treatment").cast("double")
    ca = F.col("conv_control").cast("double")
    cb = F.col("conv_treatment").cast("double")
    ra = ca / na
    rb = cb / nb
    pooled = (ca + cb) / (na + nb)
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    both_arms = (F.col("n_control") > 0) & (F.col("n_treatment") > 0)
    # z undefined when pooled rate is 0 or 1 (zero standard error) — the
    # degenerate small-SF corners; NULL in both engines, never a div-by-zero
    se_pos = (
        both_arms
        & (F.col("conv_control") + F.col("conv_treatment") > 0)
        & (
            F.col("conv_control") + F.col("conv_treatment")
            < F.col("n_control") + F.col("n_treatment")
        )
    )
    return agg.select(
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        F.when(F.col("n_control") > 0, F.round(ra, 6)).alias("rate_control"),
        F.when(F.col("n_treatment") > 0, F.round(rb, 6)).alias("rate_treatment"),
        F.when(both_arms, F.round(rb - ra, 6)).alias("abs_lift"),
        F.when(both_arms & (F.col("conv_control") > 0),
               F.round((rb - ra) / ra, 6)).alias("rel_lift"),
        F.when(se_pos, F.round((rb - ra) / se, 6)).alias("z_score"),
    )


AB_TEST_REPORT_SQL = """
WITH per_user AS (
    SELECT user_id,
           CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     > sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                THEN 1 ELSE 0 END AS converted
    FROM events GROUP BY user_id
),
assigned AS (
    SELECT converted,
           CAST(('0x' || substr(
               md5(CAST(user_id AS VARCHAR) || '|ab-exp-1'), 1, 8)
           ) AS BIGINT) % 2 AS variant
    FROM per_user
),
agg AS (
    SELECT
        SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_control,
        SUM(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END)
            AS conv_control,
        SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_treatment,
        SUM(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END)
            AS conv_treatment
    FROM assigned
),
d AS (
    SELECT CAST(n_control AS BIGINT) AS n_control,
           CAST(conv_control AS BIGINT) AS conv_control,
           CAST(n_treatment AS BIGINT) AS n_treatment,
           CAST(conv_treatment AS BIGINT) AS conv_treatment,
           CAST(n_control AS DOUBLE) AS na,
           CAST(conv_control AS DOUBLE) AS ca,
           CAST(n_treatment AS DOUBLE) AS nb,
           CAST(conv_treatment AS DOUBLE) AS cb
    FROM agg
)
SELECT n_control, conv_control, n_treatment, conv_treatment,
       CASE WHEN n_control > 0 THEN round(ca / na, 6) END AS rate_control,
       CASE WHEN n_treatment > 0 THEN round(cb / nb, 6) END AS rate_treatment,
       CASE WHEN n_control > 0 AND n_treatment > 0
            THEN round(cb / nb - ca / na, 6) END AS abs_lift,
       CASE WHEN n_control > 0 AND n_treatment > 0 AND conv_control > 0
            THEN round((cb / nb - ca / na) / (ca / na), 6) END AS rel_lift,
       CASE WHEN n_control > 0 AND n_treatment > 0
                 AND conv_control + conv_treatment > 0
                 AND conv_control + conv_treatment < n_control + n_treatment
            THEN round((cb / nb - ca / na)
                       / sqrt(((ca + cb) / (na + nb))
                              * (1.0 - (ca + cb) / (na + nb))
                              * (1.0 / na + 1.0 / nb)), 6)
       END AS z_score
FROM d
"""

QUERIES["ab_test_report"] = (q_ab_test_report, AB_TEST_REPORT_SQL)


# --- exponentially-decayed trending products (round 6b) -----------------------

# Half-life = 1 day, window capped at 28 days so every decayed contribution
# count·2^(28-age) is an exact BIGINT (the whole score is integer arithmetic
# in units of 2^-28 — no floating-point accumulation anywhere).
TREND_MAX_AGE_DAYS = 28
TREND_UNIT_BITS = 28
TREND_TOP_K = 20


def q_trending_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed trending products — the "what's hot now"
    leaderboard shape: each click contributes 2^-age_days (half-life one
    day) and products rank by the decayed sum. The twist that makes it
    value-checkable: scores are computed in UNITS OF 2^-28 — each
    (product, day) bucket contributes count · 2^(28-age) which is an exact
    BIGINT, so the total is pure integer arithmetic and the displayed
    double is one exact dyadic conversion at the end. Clicks older than 28
    days contribute nothing (their unit weight would round below 1 — the
    window cap is also the exactness bound).

    Scale design (100 TB): one scan → (product, day) partial agg (the
    only shuffle), scalar max-day broadcast, TakeOrderedAndProject top-k.
    A streaming deployment maintains the same (product, day) counts
    incrementally and re-weights at read time — decay needs no state
    rewrite (the count relation is decay-free)."""
    from pyspark.sql import functions as F

    from ..sources.tables import product_id_col

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        product_id_col().alias("product_id"),
        (F.expr("CAST(ts DIV 1000000000 AS BIGINT)") / F.lit(86400))
        .cast("long")
        .alias("day"),
    ).filter(F.col("product_id").isNotNull())
    per_day = clicks.groupBy("product_id", "day").agg(
        F.count(F.lit(1)).alias("n")
    )
    latest = per_day.agg(F.max("day").alias("latest_day"))
    scored = (
        per_day.crossJoin(F.broadcast(latest))
        .withColumn("age", F.col("latest_day") - F.col("day"))
        .filter(F.col("age") <= TREND_MAX_AGE_DAYS)
        .withColumn(
            "units",
            F.expr(
                f"n * shiftleft(CAST(1 AS BIGINT), "
                f"CAST({TREND_UNIT_BITS} - age AS INT))"
            ),
        )
        .groupBy("product_id")
        .agg(F.sum("units").alias("score_units"))
    )
    return (
        scored.select(
            "product_id",
            "score_units",
            (F.col("score_units").cast("double")
             / F.lit(float(1 << TREND_UNIT_BITS))).alias("score"),
        )
        .orderBy(F.col("score_units").desc(), F.col("product_id").asc())
        .limit(TREND_TOP_K)
    )


TRENDING_PRODUCTS_SQL = """
WITH clicks AS (
    -- canonical strict-shape extraction (oracles.PRODUCT_ID_EXPR_SQL):
    -- a malformed payload must drop, not crash the oracle
    SELECT product_id,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400 AS day
    FROM (
        SELECT __PRODUCT_ID__ AS product_id,
               ts, event_type
        FROM events
    )
    WHERE event_type = 'click' AND product_id IS NOT NULL
),
per_day AS (
    SELECT product_id, day, count(*) AS n FROM clicks GROUP BY 1, 2
),
latest AS (SELECT max(day) AS latest_day FROM per_day),
scored AS (
    SELECT product_id,
           CAST(sum(n * (CAST(1 AS BIGINT) << CAST(28 - (l.latest_day - day) AS INT)))
                AS BIGINT) AS score_units
    FROM per_day, latest l
    WHERE l.latest_day - day <= 28
    GROUP BY product_id
)
SELECT product_id, score_units,
       CAST(score_units AS DOUBLE) / 268435456.0 AS score
FROM scored
ORDER BY score_units DESC, product_id ASC
LIMIT 20
"""

from ..oracles import PRODUCT_ID_EXPR_SQL as _PID_SQL  # noqa: E402

TRENDING_PRODUCTS_SQL = TRENDING_PRODUCTS_SQL.replace(
    "__PRODUCT_ID__", _PID_SQL
)

QUERIES["trending_products"] = (q_trending_products, TRENDING_PRODUCTS_SQL)


# --- per-type hourly OLS trend (round 6b) --------------------------------------


def q_event_rate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of the hourly event rate per event type — the
    capacity-planning "is traffic growing" shape. Semantics: OLS over the
    OBSERVED hourly buckets (count ≥ 1) of y = bucket count against
    x = hour index re-based to the global minimum hour. Slope and intercept
    come from exact BIGINT sufficient statistics (n, Σx, Σy, Σxy, Σx²) via
    the closed forms

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²sum)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − Σx²sum)

    — each ONE IEEE division of two exact integers, then 6-dp rounding:
    bit-identical cross-engine, no float accumulation anywhere (the same
    mergeable-statistics pattern as `price_size_correlation`). Degenerate
    types with a single observed bucket emit NULL slope/intercept.

    Scale design (100 TB): one scan → (type, hour) partial agg → per-type
    integer moments; the global min-hour scalar broadcasts."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr("CAST(ts DIV 1000000000 AS BIGINT) DIV 3600").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    base = hourly.agg(F.min("h").alias("h0"))
    m = (
        hourly.crossJoin(F.broadcast(base))
        .withColumn("x", F.col("h") - F.col("h0"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    den = F.col("n_buckets") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_num = F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")
    icpt_num = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return m.select(
        "event_type",
        "n_buckets",
        "sy",
        F.when(den > 0,
               F.round(slope_num.cast("double") / den.cast("double"), 6))
        .alias("slope_per_hour"),
        F.when(den > 0,
               F.round(icpt_num.cast("double") / den.cast("double"), 6))
        .alias("intercept"),
    )


EVENT_RATE_TREND_SQL = """
WITH hourly AS (
    SELECT event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 3600 AS h,
           count(*) AS y
    FROM events GROUP BY 1, 2
),
base AS (SELECT min(h) AS h0 FROM hourly),
m AS (
    SELECT event_type,
           count(*) AS n_buckets,
           sum(h - h0) AS sx,
           sum(y) AS sy,
           sum((h - h0) * y) AS sxy,
           sum((h - h0) * (h - h0)) AS sxx
    FROM hourly, base
    GROUP BY 1
)
SELECT event_type,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(sy AS BIGINT) AS sy,
       CASE WHEN n_buckets * sxx - sx * sx > 0
            THEN round(CAST(n_buckets * sxy - sx * sy AS DOUBLE)
                       / CAST(n_buckets * sxx - sx * sx AS DOUBLE), 6)
       END AS slope_per_hour,
       CASE WHEN n_buckets * sxx - sx * sx > 0
            THEN round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                       / CAST(n_buckets * sxx - sx * sx AS DOUBLE), 6)
       END AS intercept
FROM m
"""

QUERIES["event_rate_trend"] = (q_event_rate_trend, EVENT_RATE_TREND_SQL)


# --- session path analysis (round 6b) ------------------------------------------

# First-N events of each session define its "entry path" (caps the path
# string and makes journeys comparable across session lengths).
PATH_MAX_EVENTS = 8
PATH_TOP_K = 20


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys — the product-analytics "path analysis" shape:
    sessionize each user's events (same 1800 s inactivity gap as
    `user_sessions`), take each session's first 8 events under the total
    (ts, event_id) order, join their types into an entry path
    ('view>click>purchase…'), and rank the top-20 paths by frequency.
    Counting and ordering are exact integers/strings; the per-session
    ordered aggregation is made deterministic by sorting on the UNIQUE
    (ts, event_id) pair in both engines.

    Scale design (100 TB): one user_id shuffle serves sessionization and
    the per-session window; the path rollup is a partial agg on bounded
    path strings (≤ 8 type names); TakeOrderedAndProject top-k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # untyped events are excluded BEFORE sessionization (round 15): an
    # all-NULL-type session produced '' in Spark (concat of skipped
    # NULLs) but NULL in SQL string_agg — a path over typed events only
    # is identical in both engines; event_type completes the total order
    # (duplicated fact rows can share (s, event_id))
    ev = load_table(spark, sf_dir, "events").filter(
        valid_ts("ts") & F.col("event_type").isNotNull()
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    gap = F.col("s") - F.lag("s").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap >= SESSION_GAP_SEC), 1).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy(
        "s", "event_id", "event_type"
    )
    paths = (
        flagged.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= PATH_MAX_EVENTS)
        .groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("s", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(PATH_TOP_K)
    )


SESSION_PATHS_SQL = f"""
WITH e AS (
    SELECT user_id, event_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
    WHERE event_type IS NOT NULL
),
m AS (
    SELECT *, CASE WHEN lag(s) OVER w IS NULL
                        OR s - lag(s) OVER w >= {SESSION_GAP_SEC}
                   THEN 1 ELSE 0 END AS new_sess
    FROM e
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY s NULLS FIRST, event_id NULLS FIRST)
),
g AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY s NULLS FIRST,
                                           event_id NULLS FIRST
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM m
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
                                 ORDER BY s NULLS FIRST,
                                          event_id NULLS FIRST,
                                          event_type NULLS FIRST) AS rn
    FROM g
),
paths AS (
    SELECT user_id, sess_id,
           string_agg(event_type, '>'
                      ORDER BY s NULLS FIRST, event_id NULLS FIRST,
                               event_type NULLS FIRST) AS path
    FROM r WHERE rn <= {PATH_MAX_EVENTS}
    GROUP BY 1, 2
)
SELECT path, count(*) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {PATH_TOP_K}
"""

QUERIES["session_paths"] = (q_session_paths, SESSION_PATHS_SQL)


# --- watermarked tumbling-window review counts (round 8, VERDICT r07 #7) ----

REVIEW_WINDOW_SEC = 86400


def q_windowed_review_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked tumbling-window streaming query
    (streaming.windows.windowed_review_counts — ONE definition runs in
    both modes; the streaming replay-parity pytest pins batch == stream).
    Daily review count + 6-dp average rating per product over the review
    fact. Scale shape: one (window, product) shuffle with map-side
    partial aggregation; watermark bounds streaming state. Event time is
    restricted to the valid analytic domain (round 15: Spark's calendar
    window FLOORS pre-epoch timestamps while integer bucketing truncates
    toward zero, so negative event times break cross-engine window
    identity; clock-skewed records are quarantined, not windowed)."""
    from ..operators._util import valid_ts_sec
    from ..sources.tables import reviews_from_events

    return windowed_review_counts(
        reviews_from_events(spark, sf_dir).filter(valid_ts_sec("ts")),
        width_sec=REVIEW_WINDOW_SEC,
    )


def _windowed_review_counts_sql() -> str:
    from ..operators._util import VALID_TS_SEC_MAX, VALID_TS_SEC_MIN
    from ..oracles import REVIEWS_CTE

    return f"""
WITH {REVIEWS_CTE}
SELECT (ts // {REVIEW_WINDOW_SEC}) * {REVIEW_WINDOW_SEC} AS win_start_sec,
       product_id,
       count(*) AS n_reviews,
       round(avg(rating), 6) AS avg_rating
FROM reviews
WHERE ts >= {VALID_TS_SEC_MIN} AND ts < {VALID_TS_SEC_MAX}
GROUP BY 1, 2
"""


WINDOWED_REVIEW_COUNTS_SQL = _windowed_review_counts_sql()

QUERIES["windowed_review_counts"] = (
    q_windowed_review_counts,
    WINDOWED_REVIEW_COUNTS_SQL,
)


# --- stateful running per-user stats, batch twin (round 9, VERDICT r08 #8) --


def q_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState running-user-stats
    operator's final state (streaming.stateful.running_user_stats): per
    user, review count, exact mean rating, and last-review timestamp.
    The streaming replay-parity pytest pins last-emitted == this batch
    aggregate EXACTLY (integral ratings make the incremental sum
    order-independent). Scale shape: one user-keyed partial agg; the
    streaming form's state is a fixed-width tuple per user."""
    from ..sources.tables import reviews_from_events
    from ..streaming.stateful import user_running_stats_batch

    return user_running_stats_batch(reviews_from_events(spark, sf_dir))


def _user_running_stats_sql() -> str:
    from ..oracles import REVIEWS_CTE

    return f"""
WITH {REVIEWS_CTE}
SELECT user_id,
       count(*) AS n_reviews,
       sum(rating) / count(*) AS mean_rating,
       max(ts) AS last_ts
FROM reviews
GROUP BY user_id
"""


USER_RUNNING_STATS_SQL = _user_running_stats_sql()

QUERIES["user_running_stats"] = (
    q_user_running_stats,
    USER_RUNNING_STATS_SQL,
)


# --- stateful running per-user top-K, batch twin (round 10, VERDICT r09
# item 4: the transformWithStateInPandas-path driver row) -------------------


def q_user_topk_reviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the running top-K leaderboard operator's final state
    (streaming.stateful.running_user_topk / running_user_topk_tws — the
    latter is the Spark-4 transformWithStateInPandas form whose ListState
    holds exactly these K rows per user): per user, the top-3 review
    events by (rating DESC, ts DESC, product_id ASC). Multiset top-k is
    associative, so the incremental per-micro-batch merge equals this
    one-shot window EXACTLY (replay parity pytest-pinned in
    tests/test_scale_utils.py; ordering components are all exact —
    integral-double ratings, integer ts/ids). Scale shape: one user-keyed
    window; the streaming forms keep K fixed-width rows per user, never
    the review history."""
    from ..sources.tables import reviews_from_events
    from ..streaming.stateful import user_topk_batch

    return user_topk_batch(reviews_from_events(spark, sf_dir))


def _user_topk_reviews_sql() -> str:
    from ..oracles import REVIEWS_CTE

    return f"""
WITH {REVIEWS_CTE}
SELECT user_id, rank, product_id, rating, ts FROM (
    SELECT user_id, product_id, rating, ts,
           CAST(row_number() OVER (
               PARTITION BY user_id
               ORDER BY rating DESC, ts DESC, product_id ASC
           ) AS BIGINT) AS rank
    FROM reviews WHERE product_id IS NOT NULL
) WHERE rank <= 3
"""


USER_TOPK_REVIEWS_SQL = _user_topk_reviews_sql()

QUERIES["user_topk_reviews"] = (
    q_user_topk_reviews,
    USER_TOPK_REVIEWS_SQL,
)


# --- stream-stream interval join, batch twin (round 9) ----------------------

ATTRIBUTION_HORIZON_SEC = 3600


def q_click_attribution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream interval join
    (streaming.interval_join.click_purchase_interval_join — ONE
    definition runs in both modes; the replay-parity pytest pins
    stream == batch): every click paired with the same user's purchases
    within the hour after it. Scale shape: user-keyed equi-join with a
    codegen range predicate; the streaming form's state is bounded by
    watermark + horizon."""
    from pyspark.sql import functions as F

    from ..streaming.interval_join import click_purchase_interval_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
    )
    return click_purchase_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon_sec=ATTRIBUTION_HORIZON_SEC,
    )


CLICK_ATTRIBUTION_PAIRS_SQL = f"""
WITH e AS (
    SELECT event_id, user_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
)
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.s AS click_s, p.s AS purchase_s
FROM e c JOIN e p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.s >= c.s AND p.s <= c.s + {ATTRIBUTION_HORIZON_SEC}
"""

QUERIES["click_attribution_pairs"] = (
    q_click_attribution_pairs,
    CLICK_ATTRIBUTION_PAIRS_SQL,
)


# round 15: route these oracles through the valid event-time domain
# (oracles.valid_events_sql — Spark twin .filter(valid_ts("ts")) in the
# matching query fns above; no-op on clean generator data). daily_rollup
# and event_windows also fold in the events measure-domain guard (their
# Spark side reads load_table_clean). See the adversarial-sweep findings
# in COVERAGE.md r15.
from ..oracles import valid_events_sql as _valid_events_sql  # noqa: E402

_VALID_TS_QUERIES = (
    "sliding_windows", "user_sessions", "asof_click_purchase",
    "events_within_hour", "session_paths", "event_transitions",
)
_VALID_TS_CLEAN_QUERIES = ("daily_rollup", "event_windows")
for _n in _VALID_TS_QUERIES + _VALID_TS_CLEAN_QUERIES:
    QUERIES[_n] = (
        QUERIES[_n][0],
        _valid_events_sql(
            QUERIES[_n][1], also_clean=_n in _VALID_TS_CLEAN_QUERIES
        ),
        *QUERIES[_n][2:],
    )
del _n
