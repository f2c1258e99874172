"""Round-15 adversarial-data pins.

The full 234-query hostile sweep lives in tools/local_correctness.py
--sf-dir <adversarial dir> (committed as CORRECTNESS_ADVERSARIAL.json);
this module pins the CLASSES of cross-engine divergence that sweep
uncovered, so a regression in any one of them fails CI long before the
next full sweep:

1. the seeded generator is reproducible and actually hostile,
2. the strict product-id extraction agrees cell-for-cell with DuckDB on
   the 17-case dirty-input matrix (JSON parser leniency differs BETWEEN
   engines on every one of these),
3. a representative query from each fixed family stays hash-green on the
   hostile data (derivation totality, measure domain, valid event time,
   NULL-key quarantine, row-local pairing, unique-entity contract).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle_harness import compare  # noqa: E402

ADV_DIR = os.path.join(REPO, ".adversarial_sf")

# one representative per fixed divergence class (full inventory:
# CORRECTNESS_ADVERSARIAL.json, 234/234)
REPRESENTATIVES = [
    "good_ratings",          # dirty-total reviews derivation
    "top_supplier",          # measure-domain contract (cents casts)
    "skew_safe_event_stats", # null-safe salted-aggregate combine
    "windowed_review_counts",# valid event-time domain (window floor)
    "session_paths",         # untyped-event quarantine + total order
    "repetition_stats",      # row-local token pairing
    "fuzzy_name_pairs_d2",   # unique-entity representative
    "cosine_topk",           # vector-validity contract
    "heavy_users",           # COUNT(DISTINCT) NULL-skip parity
    "length_histogram",      # floor- vs trunc-division bucketing
]


@pytest.fixture(scope="module")
def adv_dir():
    """Generate (or reuse) the seeded adversarial directory."""
    if not os.path.exists(os.path.join(ADV_DIR, "events.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_adversarial_sf.py")],
            check=True,
            capture_output=True,
        )
    return ADV_DIR


def test_generator_is_seeded_and_hostile(tmp_path):
    """Same seed → byte-stable hostile content; the dirt is really there."""
    import duckdb

    out = str(tmp_path / "adv")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "make_adversarial_sf.py"),
            "--out", out,
        ],
        check=True,
        capture_output=True,
    )
    con = duckdb.connect()
    ev = f"{out}/events.parquet"
    n_null_user, n_nonfinite, n_preepoch = con.execute(
        f"""SELECT
          (SELECT count(*) FROM read_parquet('{ev}') WHERE user_id IS NULL),
          (SELECT count(*) FROM read_parquet('{ev}')
             WHERE isnan(value) OR isinf(value)),
          (SELECT count(*) FROM read_parquet('{ev}')
             WHERE ts < TIMESTAMP '1970-01-01')"""
    ).fetchone()
    assert n_null_user > 0 and n_nonfinite > 0 and n_preepoch > 0
    # reproducibility: a second run with the same seed is value-identical
    out2 = str(tmp_path / "adv2")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "make_adversarial_sf.py"),
            "--out", out2,
        ],
        check=True,
        capture_output=True,
    )
    diff = con.execute(
        f"""SELECT count(*) FROM (
            SELECT * FROM read_parquet('{ev}')
            EXCEPT ALL
            SELECT * FROM read_parquet('{out2}/events.parquet'))"""
    ).fetchone()[0]
    assert diff == 0


def test_strict_product_id_matrix(spark):
    """The 21-case dirty-props matrix: Spark's strict-regex extraction and
    the DuckDB oracle fragment agree CELL-FOR-CELL (get_json_object /
    from_json / json_valid all disagree on parts of this matrix — the
    round-15 derivation contract exists because of it)."""
    import duckdb

    from flink_recommendation_system_spark.oracles import PRODUCT_ID_EXPR_SQL
    from flink_recommendation_system_spark.sources.tables import product_id_col

    cases = [
        '{"k": 54}', '{"k": 54}~dup', "null", "", "NaN", '{"k": "abc"}',
        '{"k": 1.5}', '{"k": null}', "[1,2]", '{"k": 54} ',
        '{"k":54}{"k":55}', '{"k":54}', '{ "k" : 7 }', "line1\nline2",
        '{"k": -3}', None, '{"k": 999999999999999999999}',
        # round 16 (ADVICE r15 item 2): whitespace classes where Java \s
        # and RE2 \s disagree (\x0b, \f) and final line terminators
        # where Java $ and RE2 $ disagree (U+0085, U+2028) — the explicit
        # [ \t\r\n] class + \z anchor must yield NULL identically
        '{"k":5}\x0b', '{"k":5}\f', '{"k":5}\x85', '{"k":5}\u2028',
    ]
    df = spark.createDataFrame([(c,) for c in cases], "props string")
    got = [r[0] for r in df.select(product_id_col()).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {PRODUCT_ID_EXPR_SQL} FROM (SELECT ? AS props)", [c]
        ).fetchone()[0]
        for c in cases
    ]
    assert got == want


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_representative_query_green_on_hostile_data(spark, adv_dir, name):
    import __spark_entry__ as em

    fn = em.queries()[name]
    sql = em.oracle_sql()[name]
    compare(fn(spark, adv_dir), sql, adv_dir)
