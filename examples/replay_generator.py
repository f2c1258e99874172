#!/usr/bin/env python
"""Throttled review replay generator — the engine's stand-in for the
reference's producer script (kafka_stream_generator.py:27-41: replay CSV
rows into the `Reviews` topic at 1 event/s).

With no broker in this environment the "topic" is a directory consumed by
``read_review_stream_json`` (Spark's file stream source): each event is one
wire-format JSON line in its own file, written atomically (dot-prefixed temp
file + rename — the file source ignores dot-files, so a half-written event
can never be read). ``maxFilesPerTrigger=1`` on the consumer then reproduces
the reference's one-event-per-trigger cadence exactly.

The review derivation from the events table mirrors
``sources.tables.reviews_from_events`` bit-for-bit, so replayed events equal
the batch-layer rows.

Usage: python examples/replay_generator.py [sf_dir] [out_dir] [rate] [limit]
  rate  — events per second (default 1.0, the reference's throttle)
  limit — number of events to replay (default 60)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def generate(
    sf_dir: str, out_dir: str, rate: float = 1.0, limit: int = 60
) -> int:
    """Replay ``limit`` reviews from ``{sf_dir}/events.parquet`` into
    ``out_dir`` at ``rate`` events/s. Returns the number of events written.
    Pure producer — no SparkSession; DuckDB reads the parquet so the
    generator can run beside a consuming pipeline without sharing its JVM.
    """
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS product_id,
               CAST(CAST(floor(value) AS BIGINT) % 5 + 1.0 AS DOUBLE) AS rating,
               CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts
        FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
        ORDER BY ts, user_id LIMIT {int(limit)}
        """
    ).fetchall()
    os.makedirs(out_dir, exist_ok=True)
    interval = 1.0 / rate if rate > 0 else 0.0
    for i, (user_id, product_id, rating, ts) in enumerate(rows):
        line = json.dumps(
            {
                "userId": user_id,
                "productId": product_id,
                "review": rating,
                "timestamp": ts,
            }
        )
        tmp = os.path.join(out_dir, f".part-{i:06d}.json.tmp")
        final = os.path.join(out_dir, f"part-{i:06d}.json")
        with open(tmp, "w") as f:
            f.write(line + "\n")
        os.rename(tmp, final)
        if interval:
            time.sleep(interval)
    return len(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="replay-")
    )
    rate = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    limit = int(sys.argv[4]) if len(sys.argv) > 4 else 60
    n = generate(sf_dir, out_dir, rate, limit)
    print(f"replayed {n} events at {rate}/s into {out_dir}")


if __name__ == "__main__":
    main()
