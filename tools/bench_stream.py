#!/usr/bin/env python
"""Speed-layer streaming benchmark (VERDICT r13 item 4, r14 item 5):
sustained events/sec and per-trigger latency for ``start_speed_layer``
under file-source replay, in TWO modes:

- **drain** (since r14): Trigger.AvailableNow over a fixed replay corpus,
  swept over ``maxFilesPerTrigger`` — backfill throughput and the
  per-trigger cost curve vs batch size.
- **steady** (since r15): a feeder thread drops replay files into a live
  directory at a FIXED arrival rate R while the stream runs untriggered
  (processingTime 0); measures p50/p95 trigger latency at each R, whether
  the stream stays caught up, and the drain lag after the last drop —
  the numbers a user quotes for the reference's speed layer, whose replay
  DESIGN rate is 1 event/second (kafka_stream_generator.py:17,38).

Both modes collect per-trigger progress through a
``StreamingQueryListener`` (ADVICE r14 item 1: ``q.recentProgress``
retains only the last ``spark.sql.streaming.numRecentProgressUpdates``
= 100 updates, which silently dropped the first trigger of the
maxFilesPerTrigger=1 sweep point — the listener sees every event), and
count processed rows EXACTLY as the known replay-corpus size under
the Trigger.AvailableNow drain contract (every file present at start is
committed before the query stops; VERDICT r14 item 5 / ADVICE r15 item
4 — the output sink CANNOT serve as the counter because enrichment
emits one row per DISTINCT batch user, a different grain, and the
``numInputRows`` workaround 3×-overcounts under foreachBatch because
each sink action re-scans the micro-batch's files).

What each micro-batch pays is the FULL production body (both sinks: the
SADD-idempotent ratings append with its anti-join screen, and the
stream-static enrichment join against the sf-sized published model
tables with retry-read + localCheckpoint pinning).

Usage:
    python tools/bench_stream.py [sf_dir] [out_json]
defaults: $SPARK_GRAFT_SF_DIR | /root/testdata/sf0.1, BENCH_STREAM.json.
Prints the JSON line and writes it to out_json.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = 10_000
N_FILES = 100
DRAIN_SWEEP = (1, 4, 16, 64)
# steady-mode arrival rates, files/second (100 events per file)
STEADY_SWEEP = (1, 2, 4, 8)
ROWS_PER_FILE = N_EVENTS // N_FILES


def _percentile(xs: list[float], p: float) -> float:
    """True nearest-rank percentile (ADVICE r14 item 2: round() uses
    banker's rounding, which at exact .5 ranks — e.g. p50 of a 2-element
    list — picked rank 2 instead of nearest-rank 1)."""
    s = sorted(xs)
    idx = max(0, min(len(s) - 1, math.ceil(p / 100.0 * len(s)) - 1))
    return s[idx]


def _make_collector():
    """A StreamingQueryListener that keeps EVERY progress event (keyed by
    runId), immune to the 100-update recentProgress ring buffer."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Collector(StreamingQueryListener):
        def __init__(self):
            self.by_run: dict[str, list[dict]] = {}
            self._lock = threading.Lock()

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            with self._lock:
                self.by_run.setdefault(p["runId"], []).append(p)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

        def progress_for(self, run_id: str) -> list[dict]:
            with self._lock:
                return list(self.by_run.get(str(run_id), []))

    return _Collector()


def _await_listener(collector, run_id: str, min_batches: int,
                    timeout: float = 30.0) -> list[dict]:
    """Listener delivery is async — wait until the collected batch count
    stops growing (and reaches min_batches if given), then return."""
    deadline = time.monotonic() + timeout
    last = -1
    while time.monotonic() < deadline:
        cur = len(collector.progress_for(run_id))
        if cur == last and cur >= min_batches:
            break
        last = cur
        time.sleep(0.5)
    return collector.progress_for(run_id)


def _parse_progress_ts(p: dict) -> float:
    """Progress 'timestamp' (ISO-8601 UTC, trigger start) → epoch seconds."""
    import datetime as dt

    s = p["timestamp"].replace("Z", "+00:00")
    return dt.datetime.fromisoformat(s).timestamp()


def _query_idle(q, checks: int = 3, gap: float = 0.3) -> bool:
    """True when the query reports no available data and no active trigger
    ``checks`` times in a row (status flaps between micro-batches)."""
    for _ in range(checks):
        st = q.status
        if st["isDataAvailable"] or st["isTriggerActive"]:
            return False
        time.sleep(gap)
    return True


def _assert_drain_complete(ckpt_dir: str, expect_files: int) -> int:
    """Drain-completeness cross-check (ADVICE r16): the replay row count
    is reported under the AvailableNow drain contract (every file present
    at start is committed before the query stops), so VERIFY that
    contract from the query's own checkpoint instead of assuming it —
    the file source's commit log (``sources/0``) enumerates every file
    each committed batch ingested. Distinct paths across the log (compact
    files re-list everything, so distinct-ness handles them) must equal
    the replay corpus's file count; fail loudly on mismatch (a source
    misconfig, a swallowed foreachBatch error, or late-landing files
    would otherwise silently overstate throughput)."""
    src_log = os.path.join(ckpt_dir, "sources", "0")
    paths: set[str] = set()
    for fname in os.listdir(src_log):
        fpath = os.path.join(src_log, fname)
        if not os.path.isfile(fpath):
            continue
        with open(fpath) as fh:
            for line in fh:
                line = line.strip()
                if not line or not line.startswith("{"):
                    continue  # version header / non-entry lines
                entry = json.loads(line)
                if "path" in entry:
                    paths.add(entry["path"])
    if len(paths) != expect_files:
        raise RuntimeError(
            f"drain incomplete: source commit log lists {len(paths)} "
            f"files, replay corpus has {expect_files} — reported "
            "throughput would overstate; refusing to emit"
        )
    return len(paths)


def _trigger_durations(progress: list[dict]) -> list[float]:
    return [
        float(p["durationMs"]["triggerExecution"])
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_STREAM.json"

    from pyspark.sql import functions as F

    from flink_recommendation_system_spark.plans.recommendations import (
        user_recommendations,
    )
    from flink_recommendation_system_spark.plans.top_products import (
        top_products,
    )
    from flink_recommendation_system_spark.session import (
        LOCAL_SF_MAX_PARTITION_BYTES,
        get_spark,
    )
    from flink_recommendation_system_spark.sources.tables import (
        reviews_from_events,
    )
    from flink_recommendation_system_spark.streaming.pipeline import (
        read_review_stream_json,
        start_speed_layer,
    )

    spark = get_spark(
        "bench-stream", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES
    )
    spark.sparkContext.setLogLevel("ERROR")
    # belt to the listener's suspenders: even the ring buffer keeps every
    # update now, so recentProgress-based debugging sees the full run too
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(N_FILES + 2)
    )
    collector = _make_collector()
    spark.streams.addListener(collector)

    root = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        # 1) publish the sf-sized model tables once (the batch layer's job)
        reviews = reviews_from_events(spark, sf_dir)
        recs_path = f"{root}/user_recommendations"
        top_path = f"{root}/top_products"
        user_recommendations(reviews).write.mode("overwrite").parquet(
            recs_path
        )
        top_products(reviews).select("product_id").write.mode(
            "overwrite"
        ).parquet(top_path)

        # 2) a fixed replay corpus: N_EVENTS wire-format JSON lines split
        # into N_FILES equal files (the file-source twin of the Kafka
        # topic; same plan after parse_review_json)
        replay_dir = f"{root}/replay"
        from pyspark.sql import Window as W

        # row_number (not monotonically_increasing_id) for the file split:
        # mono ids are partition-prefixed, so `% N_FILES` leaves residues
        # unoccupied and some replay files empty — row_number gives the
        # exact N_EVENTS/N_FILES events per file the sweep assumes. The
        # single-partition window is fine at replay-corpus size.
        rn = F.row_number().over(
            W.orderBy("ts", "user_id", "product_id")
        )
        wire = (
            reviews.orderBy("ts", "user_id", "product_id")
            .limit(N_EVENTS)
            .select(
                F.to_json(
                    F.struct(
                        F.col("user_id").alias("userId"),
                        F.col("product_id").alias("productId"),
                        F.col("rating").alias("review"),
                        F.col("ts").alias("timestamp"),
                    )
                ).alias("value"),
                (rn % N_FILES).alias("_f"),
            )
        )
        # repartitionByRange: hash-partitioning 100 distinct _f values
        # into 100 partitions leaves ~1/e of them empty (measured: 66
        # non-empty files) — range partitioning gives one value per
        # partition, so the sweep's files-per-trigger math is exact
        wire.repartitionByRange(N_FILES, "_f").select("value").write.mode(
            "overwrite"
        ).text(replay_dir)
        corpus_rows = spark.read.text(replay_dir).count()
        replay_files = sorted(
            f for f in os.listdir(replay_dir)
            if f.endswith(".txt") and not f.startswith((".", "_"))
        )

        # ---------------- mode 1: drain (AvailableNow backfill) ----------
        drain_results = []
        for k in DRAIN_SWEEP:
            run_dir = f"{root}/run_k{k}"
            stream = read_review_stream_json(
                spark, replay_dir, max_files_per_trigger=k
            )
            t0 = time.monotonic()
            q = start_speed_layer(
                stream,
                recs_path,
                top_path,
                f"{run_dir}/user_ratings",
                f"{run_dir}/output",
                f"{run_dir}/ckpt",
                trigger={"availableNow": True},
            )
            q.awaitTermination()
            wall = time.monotonic() - t0
            expect_triggers = math.ceil(N_FILES / k)
            progress = [
                p
                for p in _await_listener(
                    collector, str(q.runId), expect_triggers
                )
                if p.get("numInputRows", 0) > 0
            ]
            # rows processed = the corpus, EXACTLY: Trigger.AvailableNow +
            # awaitTermination is the checkpoint contract that every file
            # present at start is committed before the query stops. (The
            # output sink can't serve as the counter — enrichment emits
            # one row per DISTINCT batch user, a different grain; and
            # numInputRows 3×-overcounts under foreachBatch because each
            # sink action re-scans the batch — reported for honesty only.)
            # Round 17 (ADVICE r16): the contract is now VERIFIED from
            # the query's own source commit log, not assumed.
            _assert_drain_complete(f"{run_dir}/ckpt", len(replay_files))
            rows = corpus_rows
            durations = _trigger_durations(progress)
            drain_results.append(
                {
                    "max_files_per_trigger": k,
                    "n_triggers": len(progress),
                    "rows": rows,
                    "input_rows_reported": sum(
                        p["numInputRows"] for p in progress
                    ),
                    "wall_sec": round(wall, 2),
                    "events_per_sec": round(rows / wall, 1),
                    "trigger_p50_ms": round(_percentile(durations, 50), 1),
                    "trigger_p95_ms": round(_percentile(durations, 95), 1),
                }
            )

        # ---------------- mode 2: steady (fixed arrival rate) ------------
        steady_results = []
        for rate in STEADY_SWEEP:
            run_dir = f"{root}/steady_r{rate}"
            live_dir = f"{run_dir}/live"
            os.makedirs(live_dir, exist_ok=True)

            drop_times: list[float] = []  # wall-clock (epoch s) per drop

            def _feeder():
                t_start = time.monotonic()
                for i, fname in enumerate(replay_files):
                    target = t_start + i / rate
                    now = time.monotonic()
                    if target > now:
                        time.sleep(target - now)
                    # copy to a hidden temp name, then atomic rename, so
                    # the file source never lists a half-written file
                    tmp = os.path.join(live_dir, f".tmp_{i}")
                    shutil.copyfile(
                        os.path.join(replay_dir, fname), tmp
                    )
                    os.rename(tmp, os.path.join(live_dir, f"ev_{i:04d}.txt"))
                    drop_times.append(time.time())

            # untriggered (processingTime 0) with an effectively-unbounded
            # files-per-trigger cap: each micro-batch absorbs whatever has
            # arrived — the honest test of "does it keep up at rate R"
            stream = read_review_stream_json(
                spark, live_dir, max_files_per_trigger=N_FILES
            )
            q = start_speed_layer(
                stream,
                recs_path,
                top_path,
                f"{run_dir}/user_ratings",
                f"{run_dir}/output",
                f"{run_dir}/ckpt",
                trigger=None,
            )
            feeder = threading.Thread(target=_feeder, daemon=True)
            feeder.start()
            feeder.join()
            t_last_drop = drop_times[-1]
            # drained = the query goes idle (no data available, no active
            # trigger, stable across repeated checks) AFTER the last drop
            deadline = time.monotonic() + 180
            caught_up = False
            while time.monotonic() < deadline:
                if _query_idle(q):
                    caught_up = True
                    break
                time.sleep(0.5)
            q.stop()
            q.awaitTermination()
            progress = [
                p
                for p in _await_listener(collector, str(q.runId), 1)
                if p.get("numInputRows", 0) > 0
            ]
            durations = _trigger_durations(progress)
            # drain completion instant = start of the LAST data-bearing
            # trigger + its execution time (progress timestamps are wall
            # clock, same clock as drop_times)
            drain_lag = None
            if caught_up and progress:
                last = max(progress, key=_parse_progress_ts)
                t_done = _parse_progress_ts(last) + (
                    float(last["durationMs"]["triggerExecution"]) / 1000.0
                )
                drain_lag = round(max(0.0, t_done - t_last_drop), 2)
            p95 = _percentile(durations, 95) if durations else None
            steady_results.append(
                {
                    "arrival_rate_files_per_sec": rate,
                    # corpus-derived (sf dirs smaller than N_EVENTS ship
                    # fewer rows per file than the nominal constant)
                    "arrival_rate_events_per_sec": round(
                        rate * corpus_rows / N_FILES, 1
                    ),
                    "n_triggers": len(progress),
                    # exact when caught_up (all dropped files committed);
                    # unknowable mid-backlog, so null rather than a guess
                    "rows": corpus_rows if caught_up else None,
                    "caught_up": caught_up,
                    "drain_lag_sec": drain_lag,
                    "trigger_p50_ms": (
                        round(_percentile(durations, 50), 1)
                        if durations else None
                    ),
                    "trigger_p95_ms": round(p95, 1) if p95 else None,
                    # sustainable at R = the stream STAYED CAUGHT UP: all
                    # files committed with at most ~a trigger of residual
                    # backlog after the last drop. (A p95-vs-inter-arrival
                    # test would be wrong here: micro-batches absorb every
                    # file that arrived during the previous trigger, so a
                    # 1.4 s trigger sustains a 125 ms arrival gap fine.)
                    "sustainable": bool(
                        caught_up
                        and drain_lag is not None
                        and p95 is not None
                        and drain_lag * 1000.0 <= 2 * p95
                    ),
                }
            )

        max_sustained = max(
            (r["arrival_rate_events_per_sec"]
             for r in steady_results if r["sustainable"]),
            default=None,
        )
        out = {
            "metric": "speed_layer_replay",
            "unit": "events_per_sec",
            "value": max(r["events_per_sec"] for r in drain_results),
            "sf_dir": sf_dir,
            "n_events": N_EVENTS,
            "n_files": N_FILES,
            "reference_design_rate_events_per_sec": 1,
            "row_count_source": (
                "known replay corpus (AvailableNow drain contract, "
                "verified against the source commit log per run)"
            ),
            "progress_source": "StreamingQueryListener (uncapped)",
            "sweep": drain_results,
            "steady": steady_results,
            "max_sustained_arrival_events_per_sec": max_sustained,
        }
        line = json.dumps(out)
        with open(out_json, "w") as fh:
            fh.write(line + "\n")
        print(line)
    finally:
        try:
            spark.streams.removeListener(collector)
        except Exception:
            pass
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
